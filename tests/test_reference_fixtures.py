"""Direct parity against the reference's OWN recorded pipeline states
(/root/reference/test/data/state_*.json — real LLM-produced graphs
captured mid-run). These pin the north rule's P/R >= 0.95 on the
reference's actual data, not synthetic recreations:

- the rendered->sublimated state transition (sublimation split +
  validate/connect) reproduced triple-for-triple (P/R = 1.0);
- the sha256[:12] chunk-id invariant over every chunk text in every
  fixture;
- our Turtle parser round-trips every rdflib-serialized fixture graph
  losslessly.
"""

import glob
import json

import pytest

from ontocast_spark.kernels.graphs import connect_via_hub
from ontocast_spark.kernels.rdfterms import render_text_hash
from ontocast_spark.sources.turtle import parse_turtle, serialize_turtle

DATA = "/root/reference/test/data"


def _load(name):
    with open(f"{DATA}/{name}.json") as f:
        return json.load(f)


def test_sublimate_connect_transition_exact():
    """state_rendered_facts -> state_sublimated is exactly our
    sublimation split + hub auto-connect (reference agent/
    sublimate_ontology.py + tool/validate.py) on a real LLM graph."""
    r = _load("state_rendered_facts")
    s = _load("state_sublimated")
    rendered, _ = parse_turtle(r["current_chunk"]["graph"])
    expected, _ = parse_turtle(s["current_chunk"]["graph"])
    doc_hid = r["current_chunk"]["hid"]
    chunk_iri = f"https://example.com/doc/{r['doc_hid']}/chunk/{doc_hid}"
    ns = chunk_iri + "/"
    facts = [
        t
        for t in rendered
        if t[0].startswith(ns)
        or t[1].startswith(ns)
        or ((not t[3]) and t[2].startswith(ns))
    ]
    onto = [t for t in rendered if t not in facts]
    assert onto == []  # this fixture's graph is all chunk-namespace
    connected = set(connect_via_hub(facts, chunk_iri))
    expect = set(map(tuple, expected))
    tp = len(connected & expect)
    precision = tp / len(connected)
    recall = tp / len(expect)
    assert precision == 1.0 and recall == 1.0, (
        sorted(expect - connected)[:5],
        sorted(connected - expect)[:5],
    )


def _all_chunks():
    for p in sorted(glob.glob(f"{DATA}/state_*.json")):
        d = json.load(open(p))
        chunks = list(d.get("chunks", [])) + list(d.get("chunks_processed", []))
        cc = d.get("current_chunk")
        if isinstance(cc, dict):
            chunks.append(cc)
        for c in chunks:
            if isinstance(c, dict) and c.get("text") and c.get("hid"):
                yield p.rsplit("/", 1)[-1], c


def test_chunk_hid_invariant_on_reference_fixtures():
    """hid == sha256(text)[:12] for every recorded chunk (C7 exactness
    on the reference's own data — the per-chunk text-equality anchor)."""
    n = 0
    for fname, c in _all_chunks():
        assert render_text_hash(c["text"]) == c["hid"], fname
        n += 1
    assert n >= 15  # the fixture set carries real chunks


@pytest.mark.parametrize(
    "name",
    ["state_rendered_facts", "state_sublimated", "state_facts_success",
     "state_onto_rendered", "state_chunked"],
)
def test_turtle_parser_roundtrips_reference_graphs(name):
    """Our rdflib-free parser ingests the reference's rdflib-serialized
    Turtle losslessly (prefixed names, typed/bare literals, multi-
    predicate blocks) and round-trips through our serializer."""
    d = _load(name)
    graphs = []
    cc = d.get("current_chunk")
    if isinstance(cc, dict) and cc.get("graph"):
        graphs.append(cc["graph"])
    onto = d.get("current_ontology") or {}
    if isinstance(onto, dict) and onto.get("graph"):
        graphs.append(onto["graph"])
    addendum = d.get("ontology_addendum") or {}
    if isinstance(addendum, dict) and addendum.get("graph"):
        graphs.append(addendum["graph"])
    assert graphs
    nonempty = 0
    for ttl in graphs:
        triples, prefixes = parse_turtle(ttl)
        if not triples:  # some fixture states carry prefix-only graphs
            continue
        nonempty += 1
        back, _ = parse_turtle(serialize_turtle(triples, prefixes))
        assert set(back) == set(map(tuple, triples))
    if nonempty == 0:
        pytest.skip("fixture state has only empty graphs")


def test_reference_ontology_dir_loads():
    """Both shipped reference ontologies (fin-securities.ttl with
    OWL axioms, criminal.ttl with an owl:oneOf COLLECTION) parse and
    index — the S4 source on the reference's real files."""
    from ontocast_spark.sources.documents import load_ontology_dir

    idx = load_ontology_dir("/root/reference/data/ontologies")
    ids = {t.ontology_id for t in idx.terms}
    assert ids == {"fcaont", "fsec"}
    assert len(idx.terms) >= 30

    ttl = open("/root/reference/data/ontologies/criminal.ttl").read()
    triples, _ = parse_turtle(ttl)
    # the owl:oneOf ( ... ) enumeration expands to a 5-element rdf list
    firsts = [t for t in triples if t[1].endswith("#first")]
    rests = [t for t in triples if t[1].endswith("#rest")]
    assert len(firsts) == 5 and len(rests) == 5
    nil = [t for t in rests if t[2].endswith("#nil")]
    assert len(nil) == 1  # exactly one chain terminator
    oneof = [t for t in triples if t[1].endswith("#oneOf")]
    assert len(oneof) == 1 and oneof[0][2].startswith("urn:skolem:")
