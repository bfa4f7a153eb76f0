"""Turtle parser robustness corpus: FOAF/SKOS/PROV-shaped fixtures in
the idioms published ontologies actually use (SPARQL-style PREFIX/BASE,
@base-relative IRIs, blank-node labels, single/triple-quoted literals,
unicode escapes, collections, booleans, exponent decimals). rdflib is
unavailable in this environment, so the oracle is hand-verified triple
counts + spot triples + a full serialize->reparse round-trip."""

import os

from ontocast_spark.sources.turtle import parse_turtle, serialize_turtle

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ttl")


def _load(name):
    with open(os.path.join(FIX, name)) as f:
        text = f.read()
    return parse_turtle(text)


def test_foaf_shaped():
    triples, prefixes = _load("foaf_shaped.ttl")
    assert len(triples) == 19
    assert prefixes["foaf"] == "http://xmlns.com/foaf/0.1/"
    by_pred = {}
    for s, p, o, lit, dt in triples:
        by_pred.setdefault(p, []).append((s, o, lit, dt))
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    foaf = "http://xmlns.com/foaf/0.1/"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    # lang tag rides the dt slot
    assert (foaf + "Person", "Person", True, "@en") in by_pred[rdfs + "label"]
    # typed literal
    ages = [t for t in by_pred[foaf + "age"]]
    assert ages[0][1:] == ("42", True, xsd + "integer")
    # blank-node labels resolve to stable skolems; alice knows bob
    (alice, bob, lit, _), = by_pred[foaf + "knows"][-1:]
    assert alice.startswith("urn:skolem:") and alice.endswith(":lalice")
    assert bob.endswith(":lbob") and not lit
    # single-quoted literal with escaped quote
    assert any(o == "Bob O'Hare" for _, o, _, _ in by_pred[foaf + "name"])


def test_skos_shaped():
    triples, prefixes = _load("skos_shaped.ttl")
    assert len(triples) == 19
    skos = "http://www.w3.org/2004/02/skos/core#"
    scheme = "http://example.org/scheme/"
    ts = {(s, p, o) for s, p, o, _, _ in triples}
    # @base resolution: <> is the base itself, <animals> / nested paths
    assert (scheme, skos + "hasTopConcept", scheme + "animals") in ts
    assert (scheme + "animals", skos + "narrower", scheme + "animals/cats") in ts
    assert (scheme + "plants", skos + "inScheme", scheme) in ts
    # triple-single-quoted literal keeps its newline
    defs = [o for s, p, o, _, _ in triples if p == skos + "definition"]
    assert defs == ["Living\nthings that move."]
    # bare decimal literal
    ext = [(o, dt) for _, p, o, _, dt in triples
           if p == "http://purl.org/dc/terms/extent"]
    assert ext == [("0.5", "http://www.w3.org/2001/XMLSchema#decimal")]


def test_prov_shaped():
    triples, prefixes = _load("prov_shaped.ttl")
    assert len(triples) == 18
    prov = "http://www.w3.org/ns/prov#"
    basep = "http://example.org/prov/"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    ts = {(s, p, o) for s, p, o, _, _ in triples}
    # ../ relative resolution against BASE
    assert (basep + "data.csv", prov + "wasDerivedFrom",
            "http://example.org/raw/dump.bin") in ts
    # boolean + exponent decimal literals
    vals = {p: (o, dt) for _, p, o, _, dt in triples
            if p.startswith("http://example.org/prov/ns#")}
    assert vals["http://example.org/prov/ns#succeeded"] == (
        "true", "http://www.w3.org/2001/XMLSchema#boolean")
    assert vals["http://example.org/prov/ns#tolerance"][0] == "1.5e-3"
    # collection expands to a 3-link first/rest chain ending in nil
    firsts = [(s, o) for s, p, o, _, _ in triples if p == rdf + "first"]
    rests = [(s, o) for s, p, o, _, _ in triples if p == rdf + "rest"]
    assert len(firsts) == 3 and len(rests) == 3
    assert [o for _, o in firsts] == [basep + f"stage/{x}" for x in "abc"]
    assert rests[-1][1] == rdf + "nil"
    # triple-quoted long literal with embedded quotes and newline
    labels = [o for s, p, o, _, _ in triples
              if s == basep + "report" and p.endswith("#label")]
    assert labels == ['Line one\nLine "two" with quotes']


def test_corpus_round_trip():
    """serialize -> reparse is triple-set identical for every fixture
    (the engine's deterministic Turtle output is itself re-ingestable)."""
    for name in os.listdir(FIX):
        triples, prefixes = _load(name)
        text2 = serialize_turtle(triples, prefixes)
        triples2, _ = parse_turtle(text2)
        assert set(map(tuple, triples2)) == set(map(tuple, triples)), name


def test_unicode_and_leading_dot_literals():
    triples, _ = parse_turtle(
        'PREFIX ex: <http://e/> '
        'ex:s ex:euro "cost: \\u20AC50" ; ex:frac .5 ; '
        'ex:astral "\\U0001F600" .'
    )
    vals = {p.rsplit("/", 1)[-1]: o for _, p, o, _, _ in triples}
    assert vals["euro"] == "cost: €50"
    assert vals["frac"] == ".5"
    assert vals["astral"] == "\U0001F600"


def test_serialize_parse_fuzz_round_trip():
    """Seeded random triple sets (IRIs, plain/lang/typed literals with
    escapes-in-need characters) must survive serialize -> parse with
    triple-set equality — the serializer's output is always
    re-ingestable by its own parser."""
    import random

    rng = random.Random(41)
    charpool = "abc XYZ 0_9-\"\\\n\r\t'é€#<>;,."
    xsd = "http://www.w3.org/2001/XMLSchema#"

    def rand_text(maxlen=12):
        return "".join(rng.choice(charpool) for _ in range(rng.randrange(0, maxlen)))

    for trial in range(8):
        triples = []
        for i in range(rng.randrange(1, 25)):
            s = f"http://ex.org/s{rng.randrange(6)}"
            p = f"http://ex.org/p{rng.randrange(4)}"
            kind = rng.randrange(3)
            if kind == 0:
                o, lit, dt = f"http://ex.org/o{rng.randrange(8)}", False, None
            elif kind == 1:
                o, lit, dt = rand_text(), True, rng.choice(
                    [None, "@en", "@de-DE", xsd + "string"]
                )
            else:
                o, lit, dt = str(rng.randrange(-50, 50)), True, xsd + "integer"
            triples.append((s, p, o, lit, dt))
        text = serialize_turtle(
            triples, {"ex": "http://ex.org/", "xsd": xsd}
        )
        reparsed, _ = parse_turtle(text)
        assert set(map(tuple, reparsed)) == set(map(tuple, triples)), (
            trial, text[:500]
        )
