"""SPARQL text front-end (plans/sparql.py): the reference's own
embedded query strings (agent/sublimate_ontology.py:31-72, the Fuseki
surface fuseki.py:188-270) must parse and evaluate to the same results
as the programmatic BGP API."""

import pytest
from pyspark.sql import functions as F

from ontocast_spark.plans.bgp import bgp_select
from ontocast_spark.plans.sparql import (
    SparqlSyntaxError,
    parse_sparql,
    sparql,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples(spark, rows, meta=False):
    if meta:
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "obj_lang string, obj_datatype string",
        )
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_reference_sublimate_roundtrip(spark):
    """The two f-string queries the reference runs to split a chunk
    graph into facts vs ontology (sublimate_ontology.py:31-72) parse
    and produce complementary partitions of the graph."""
    cd = "https://example.com/doc/1/chunk/abc/"
    rows = [
        (cd + "acme", RDF_TYPE, "https://onto/Company", False, None, None),
        (cd + "acme", "https://onto/employs", cd + "dana", False, None, None),
        ("https://onto/Company", "https://w3/label", "Company", True, "en", None),
        ("https://onto/employs", RDF_TYPE, "https://onto/Property", False, None, None),
        # facts row where only the OBJECT is in the chunk namespace
        ("https://onto/root", "https://onto/contains", cd + "acme", False, None, None),
        # literal object mentioning the namespace string must NOT count
        ("https://onto/note", "https://w3/label", cd + "x", True, None, None),
    ]
    tri = _triples(spark, rows, meta=True)

    query_facts = f"""
        PREFIX cd: <{cd}>

        SELECT ?s ?p ?o
        WHERE {{
        ?s ?p ?o .
        FILTER (
            STRSTARTS(STR(?s), STR(cd:)) ||
            STRSTARTS(STR(?p), STR(cd:)) ||
            (isIRI(?o) && STRSTARTS(STR(?o), STR(cd:)))
        )
        }}
    """
    query_ontology = f"""
    PREFIX cd: <{cd}>

    SELECT ?s ?p ?o
    WHERE {{
    ?s ?p ?o .
    FILTER (
        !(
            STRSTARTS(STR(?s), STR(cd:)) ||
            STRSTARTS(STR(?p), STR(cd:)) ||
            (isIRI(?o) && STRSTARTS(STR(?o), STR(cd:)))
        )
    )
    }}
    """
    facts = {(r["s"], r["p"], r["o"]) for r in sparql(tri, query_facts).collect()}
    onto = {(r["s"], r["p"], r["o"]) for r in sparql(tri, query_ontology).collect()}
    allr = {(s, p, o) for s, p, o, *_ in rows}
    assert facts | onto == allr
    assert facts & onto == set()
    assert (cd + "acme", RDF_TYPE, "https://onto/Company") in facts
    assert ("https://onto/root", "https://onto/contains", cd + "acme") in facts
    # the literal that merely LOOKS like a chunk IRI stays ontology-side
    assert ("https://onto/note", "https://w3/label", cd + "x") in onto
    assert ("https://onto/Company", "https://w3/label", "Company") in onto


def test_select_join_matches_programmatic(spark):
    tri = _triples(spark, [
        ("o1", "has_part", "p1"), ("o2", "has_part", "p2"),
        ("p1", "brand", "Brand#13"), ("p2", "brand", "Brand#42"),
    ])
    text = """
    SELECT ?o ?b WHERE {
      ?o <has_part> ?p .
      ?p <brand> ?b .
      FILTER(STRENDS(?b, "13"))
    }
    """
    got = {(r["o"], r["b"]) for r in sparql(tri, text).collect()}
    want_sols = bgp_select(tri, [("?o", "has_part", "?p"), ("?p", "brand", "?b")])
    want = {(r["o"], r["b"])
            for r in want_sols.filter(F.col("b").endswith("13")).select("o", "b").collect()}
    assert got == want == {("o1", "Brand#13")}


def test_prefixed_names_and_a_keyword(spark):
    tri = _triples(spark, [
        ("e1", RDF_TYPE, "https://onto/Person"),
        ("e2", RDF_TYPE, "https://onto/Company"),
    ])
    text = """
    PREFIX onto: <https://onto/>
    SELECT ?e WHERE { ?e a onto:Person . }
    """
    assert [r["e"] for r in sparql(tri, text).collect()] == ["e1"]


def test_union_and_optional(spark):
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "likes", "c"),
        ("a", "age", "30"),
    ])
    text = """
    SELECT ?x WHERE { { ?x <knows> ?y } UNION { ?x <likes> ?y } }
    """
    assert {r["x"] for r in sparql(tri, text).collect()} == {"a", "b"}

    text2 = """
    SELECT ?x ?age WHERE {
      ?x <knows> ?y .
      OPTIONAL { ?x <age> ?age }
    }
    """
    got = {(r["x"], r["age"]) for r in sparql(tri, text2).collect()}
    assert got == {("a", "30")}
    text3 = """
    SELECT ?x ?age WHERE {
      ?x <likes> ?y .
      OPTIONAL { ?x <age> ?age }
      FILTER(!BOUND(?age))
    }
    """
    got3 = {(r["x"], r["age"]) for r in sparql(tri, text3).collect()}
    assert got3 == {("b", None)}


def test_property_path_text(spark):
    tri = _triples(spark, [
        ("a", "within", "b"), ("b", "within", "c"), ("c", "within", "d"),
    ])
    text = "SELECT ?x ?y WHERE { ?x <within>+ ?y }"
    got = {(r["x"], r["y"]) for r in sparql(tri, text).collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    # sequence + inverse through prefixed names
    text2 = """
    PREFIX p: <https://p/>
    SELECT ?x ?y WHERE { ?x ^<within> ?y }
    """
    got2 = {(r["x"], r["y"]) for r in sparql(tri, text2).collect()}
    assert got2 == {("b", "a"), ("c", "b"), ("d", "c")}


def test_ask_construct_delete_insert(spark):
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"),
    ])
    assert sparql(tri, "ASK { ?x <knows> <c> }") is True
    assert sparql(tri, "ASK { ?x <knows> <zzz> }") is False

    out = sparql(tri, """
        CONSTRUCT { ?y <known_by> ?x } WHERE { ?x <knows> ?y }
    """)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {("b", "known_by", "a"), ("c", "known_by", "b")}

    left = sparql(tri, "DELETE WHERE { ?x <knows> <c> }")
    assert {(r["subj"], r["obj"]) for r in left.collect()} == {("a", "b")}

    ins = sparql(tri, "INSERT DATA { <d> <knows> <a> . <a> <knows> <b> }")
    assert ins.count() == 3


def test_describe_var_and_construct_where(spark):
    """DESCRIBE ?v WHERE { } (all triples touching each bound
    resource, via two hash semi-joins) and the CONSTRUCT WHERE { }
    plain-BGP shorthand (spec §10.1.2)."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("a", "type", "Person"),
        ("b", "type", "Person"), ("c", "type", "Robot"), ("x", "likes", "a"),
    ])
    got = {(r["subj"], r["pred"], r["obj"]) for r in sparql(
        tri, 'DESCRIBE ?p WHERE { ?p <type> "Robot" }'
    ).collect()}
    assert got == {("b", "knows", "c"), ("c", "type", "Robot")}
    # two described resources; a triple touching both appears once
    assert sparql(
        tri, 'DESCRIBE ?p WHERE { ?p <type> "Person" }'
    ).count() == 5
    got = {(r["subj"], r["pred"], r["obj"]) for r in sparql(
        tri, "CONSTRUCT WHERE { ?s <knows> ?o . ?s <type> ?t }"
    ).collect()}
    assert got == {
        ("a", "knows", "b"), ("a", "type", "Person"),
        ("b", "knows", "c"), ("b", "type", "Person"),
    }
    with pytest.raises(SparqlSyntaxError, match="plain triple-pattern"):
        sparql(tri, 'CONSTRUCT WHERE { ?s <knows> ?o FILTER(?o != "b") }')
    with pytest.raises(SparqlSyntaxError, match="needs WHERE"):
        sparql(tri, "DESCRIBE ?p")
    # the describe split-join plan must stay hash-based
    plan = sparql(
        tri, 'DESCRIBE ?p WHERE { ?p <type> "Person" }'
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_insert_where_and_modify(spark):
    """SPARQL 1.1 Update Modify: INSERT {} WHERE {} and the combined
    DELETE {} INSERT {} WHERE {} — both templates instantiate over
    the same pre-update solutions; deletes apply before inserts; set
    semantics on insert."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("a", "age", "30"),
    ])
    out = sparql(tri, "INSERT { ?o <knownBy> ?s } WHERE { ?s <knows> ?o }")
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {
        ("a", "knows", "b"), ("b", "knows", "c"), ("a", "age", "30"),
        ("b", "knownBy", "a"), ("c", "knownBy", "b"),
    }
    # inserting already-present triples is a set-semantics no-op
    assert sparql(
        tri, "INSERT { ?s <knows> ?o } WHERE { ?s <knows> ?o }"
    ).count() == 3
    # predicate rename: delete + insert over the same solutions
    out = sparql(tri, """
        DELETE { ?s <knows> ?o } INSERT { ?s <acquaintedWith> ?o }
        WHERE { ?s <knows> ?o }
    """)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {
        ("a", "acquaintedWith", "b"), ("b", "acquaintedWith", "c"),
        ("a", "age", "30"),
    }
    # a triple deleted AND re-inserted by the same modify survives
    assert sparql(tri, """
        DELETE { ?s <knows> ?o } INSERT { ?s <knows> ?o }
        WHERE { ?s <knows> ?o }
    """).count() == 3
    # the modify WHERE takes the full recursive grammar
    out = sparql(tri, """
        INSERT { ?s <adult> "true" } WHERE {
            ?s <knows> ?o OPTIONAL { ?s <age> ?a FILTER(?a > 18) }
            FILTER(BOUND(?a))
        }
    """)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert ("a", "adult", "true") in got and len(got) == 4


def test_modify_preserves_term_metadata(spark):
    """Re-inserting an existing triple must not null out its term
    metadata; genuinely new rows carry NULL metadata columns."""
    tri = _triples(spark, [
        ("a", "label", "chat", True, "en", None),
    ], meta=True)
    out = sparql(tri, """
        INSERT { ?s <label> ?v . ?s <hasLabel> "yes" }
        WHERE { ?s <label> ?v }
    """)
    rows = {(r["subj"], r["pred"], r["obj"]): r for r in out.collect()}
    assert rows[("a", "label", "chat")]["obj_lang"] == "en"
    assert rows[("a", "hasLabel", "yes")]["obj_lang"] is None


def test_modify_guards(spark):
    tri = _triples(spark, [("a", "p", "b")])
    with pytest.raises(SparqlSyntaxError, match="INSERT"):
        sparql(tri, "INSERT { ?s <q> ?o }")  # no WHERE
    with pytest.raises(SparqlSyntaxError, match="path"):
        sparql(tri, "INSERT { ?s <q>+ ?o } WHERE { ?s <p> ?o }")
    with pytest.raises(SparqlSyntaxError, match="INSERT DATA or INSERT"):
        sparql(tri, "INSERT <a> <b> <c>")


def test_aggregates_group_by(spark):
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"), ("b", "score", "5"),
    ])
    text = """
    SELECT ?x (COUNT(?s) AS ?n) (SUM(?s) AS ?total)
    WHERE { ?x <score> ?s } GROUP BY ?x
    """
    got = {(r["x"], r["n"], float(r["total"]))
           for r in sparql(tri, text).collect()}
    assert got == {("a", 2, 3.0), ("b", 1, 5.0)}


def test_order_limit(spark):
    tri = _triples(spark, [(f"e{i}", "v", str(i)) for i in range(5)])
    text = "SELECT ?x WHERE { ?x <v> ?n } ORDER BY DESC(?n) LIMIT 2"
    assert [r["x"] for r in sparql(tri, text).collect()] == ["e4", "e3"]


def test_numeric_filter_comparison(spark):
    tri = _triples(spark, [
        ("a", "price", "150"), ("b", "price", "50"),
    ])
    text = "SELECT ?x WHERE { ?x <price> ?p . FILTER(?p > 100) }"
    assert [r["x"] for r in sparql(tri, text).collect()] == ["a"]


def test_semicolon_comma_continuations(spark):
    tri = _triples(spark, [
        ("a", "knows", "b"), ("a", "knows", "c"), ("a", "age", "30"),
    ])
    text = """
    SELECT ?x WHERE { ?x <knows> <b>, <c> ; <age> "30" . }
    """
    assert [r["x"] for r in sparql(tri, text).collect()] == ["a"]


def test_reference_fuseki_discovery_query(spark):
    """The reference's ontology-discovery query runs VERBATIM
    (fuseki.py:212-218): GRAPH ?g blocks inside UNION arms over a
    graph-column triple table — named-graph hits and default-graph
    hits union, deduped by DISTINCT."""
    OWL_ONT = "http://www.w3.org/2002/07/owl#Ontology"
    tri = spark.createDataFrame(
        [
            ("https://onto/a", RDF_TYPE, OWL_ONT, "https://g/onto-a"),
            ("https://onto/b", RDF_TYPE, OWL_ONT, None),  # default graph
            ("https://onto/a", RDF_TYPE, OWL_ONT, None),  # both places
            ("https://x/doc", RDF_TYPE, "https://onto/Doc", "https://g/facts"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    list_query = """
    SELECT DISTINCT ?s WHERE {
      { GRAPH ?g { ?s a <http://www.w3.org/2002/07/owl#Ontology> } }
      UNION
      { ?s a <http://www.w3.org/2002/07/owl#Ontology> }
    }
    """
    got = {r["s"] for r in sparql(tri, list_query).collect()}
    assert got == {"https://onto/a", "https://onto/b"}

    # GRAPH <iri> filters; shared ?g correlates patterns in one graph
    got2 = {tuple(r) for r in sparql(tri, """
        SELECT ?s ?g WHERE { GRAPH ?g { ?s a <%s> } }
    """ % OWL_ONT).collect()}
    assert got2 == {("https://onto/a", "https://g/onto-a")}
    got3 = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { GRAPH <https://g/facts> { ?s ?p ?o } }
    """).collect()}
    assert got3 == {"https://x/doc"}
    # spec default-graph semantics: a plain pattern on a quad table
    # matches the DEFAULT graph (NULL rows) only — x/doc lives solely
    # in a named graph and must NOT match without GRAPH
    got4 = {r["s"] for r in sparql(
        tri, "SELECT ?s WHERE { ?s a <https://onto/Doc> }"
    ).collect()}
    assert got4 == set()
    # no graph column -> clear subset error (incl. inside MINUS)
    with pytest.raises(SparqlSyntaxError):
        sparql(tri.drop("graph"),
               "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } }")
    with pytest.raises(SparqlSyntaxError):
        sparql(tri.drop("graph"), """
            SELECT ?s WHERE { ?s ?p ?o . MINUS { GRAPH ?g { ?s ?p ?o } } }
        """)
    # GRAPH in DELETE: explicit subset error, not an unpack crash
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "DELETE WHERE { GRAPH ?g { ?s ?p ?o } }")


def test_random_bgp_text_equivalence(spark):
    """Seeded random BGPs serialized to SPARQL text must evaluate
    identically to the programmatic bgp_select on a random graph —
    the parser is plan/semantics-neutral by construction, this pins
    it across pattern shapes (shared vars, constants in every slot,
    repeated vars, 1-3 patterns)."""
    import random

    rng = random.Random(1234)
    nodes = [f"https://g/n{i}" for i in range(8)]
    preds = [f"https://g/p{i}" for i in range(4)]
    rows = [
        (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
        for _ in range(60)
    ]
    tri = _triples(spark, rows)

    def term(vars_pool):
        r = rng.random()
        if r < 0.55:
            return "?" + rng.choice(vars_pool)
        if r < 0.85:
            return rng.choice(nodes)
        return rng.choice(preds)

    checked = 0
    for _ in range(25):
        vars_pool = ["a", "b", "c"]
        n_pat = rng.randint(1, 3)
        pats = []
        for _ in range(n_pat):
            s = term(vars_pool)
            p = "?" + rng.choice(vars_pool) if rng.random() < 0.3 \
                else rng.choice(preds)
            o = term(vars_pool)
            pats.append((s, p, o))
        used = sorted({x[1:] for pat in pats for x in pat
                       if x.startswith("?")})
        if not used:
            continue
        want = bgp_select(tri, pats)

        def fmt(t):
            return t if t.startswith("?") else f"<{t}>"

        text = ("SELECT DISTINCT " + " ".join("?" + v for v in used)
                + " WHERE { "
                + " . ".join(" ".join(fmt(x) for x in pat) for pat in pats)
                + " }")
        got = sparql(tri, text)
        want_rows = sorted(map(tuple, want.select(*used).distinct().collect()))
        got_rows = sorted(map(tuple, got.collect()))
        assert got_rows == want_rows, (text, pats)
        checked += 1
    assert checked >= 15  # the generator actually exercised the space


def test_minus_and_values(spark):
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("c", "knows", "d"),
        ("b", "blocked", "yes"),
    ])
    # MINUS removes solutions compatible on shared vars
    got = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . MINUS { ?x <blocked> ?z } }
    """).collect()}
    assert got == {"a", "c"}
    # spec corner: MINUS with NO shared variable removes nothing
    got2 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . MINUS { ?p <blocked> ?z } }
    """).collect()}
    assert got2 == {"a", "b", "c"}
    # spec §10.2: VALUES data is a MULTISET — duplicate rows
    # (including repeated UNDEF wildcards) multiply solutions under
    # bag semantics (hypothesis-found regression, seed 36544)
    from collections import Counter
    bag = Counter(r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . VALUES (?x) { (<a>) (UNDEF) (UNDEF) } }
    """).collect())
    # solutions of ?x <knows> ?y: a->b, b->c, c->d (one row each);
    # 'a' joins its bound row AND both UNDEFs, b/c join both UNDEFs
    assert bag == Counter({"a": 3, "b": 2, "c": 2})
    # VALUES constrains; single-var and multi-var forms
    got3 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . VALUES ?x { <a> <c> <zzz> } }
    """).collect()}
    assert got3 == {"a", "c"}
    got4 = {(r["x"], r["y"]) for r in sparql(tri, """
        SELECT ?x ?y WHERE {
          ?x <knows> ?y . VALUES (?x ?y) { (<a> <b>) (<b> <d>) }
        }
    """).collect()}
    assert got4 == {("a", "b")}
    # VALUES-only group: the inline table IS the solution set
    got5 = {r["x"] for r in sparql(
        tri, "SELECT ?x WHERE { VALUES ?x { <p> <q> } }"
    ).collect()}
    assert got5 == {"p", "q"}
    # UNDEF is the spec wildcard: compatible with every solution
    got_undef = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . VALUES ?x { UNDEF } }
    """).collect()}
    assert got_undef == {"a", "b", "c"}
    # multi-var rows: UNDEF leaves that slot unconstrained, the bound
    # slot still filters
    got_u2 = {(r["x"], r["y"]) for r in sparql(tri, """
        SELECT ?x ?y WHERE {
          ?x <knows> ?y . VALUES (?x ?y) { (<a> UNDEF) (UNDEF <d>) }
        }
    """).collect()}
    assert got_u2 == {("a", "b"), ("c", "d")}

    # spec: an OPTIONAL-unbound shared var is COMPATIBLE in MINUS (the
    # unbound var is outside the domain; x alone overlaps and agrees)
    got6 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <nick> ?n }
          MINUS { ?x <blocked> ?n }
        }
    """).collect()}
    assert got6 == {"a", "c"}  # b removed: n unbound, x overlaps+agrees
    # spec: VALUES binds an OPTIONAL-unbound shared var from the row
    got7 = {(r["x"], r["n"]) for r in sparql(tri, """
        SELECT ?x ?n WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <nick> ?n }
          VALUES ?n { <nickname> }
        }
    """).collect()}
    assert got7 == {("a", "nickname"), ("b", "nickname"), ("c", "nickname")}
    # a VALUES-only group anchors OPTIONAL (in-subset since round 5):
    # the inline table is the left side of the left join
    got_vo = sorted(
        (r["x"], r["y"]) for r in sparql(tri, """
            SELECT * WHERE { VALUES ?x { <a> <zzz> }
                             OPTIONAL { ?x <knows> ?y } }
        """).collect()
    )
    assert got_vo == [("a", "b"), ("zzz", None)]

    # FILTER [NOT] EXISTS: semi/anti join on the shared vars, both the
    # bare and parenthesized forms
    got8 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . FILTER NOT EXISTS { ?x <blocked> ?z } }
    """).collect()}
    assert got8 == {"a", "c"}
    got9 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . FILTER(EXISTS { ?x <blocked> ?z }) }
    """).collect()}
    assert got9 == {"b"}
    # unshared probe: scalar condition over the whole solution set
    got10 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . FILTER NOT EXISTS { ?p <nope> ?q } }
    """).collect()}
    assert got10 == {"a", "b", "c"}
    got11 = sparql(tri, """
        SELECT ?x WHERE { ?x <knows> ?y . FILTER EXISTS { ?p <nope> ?q } }
    """).count()
    assert got11 == 0

    # EXISTS correlates on BIND-introduced variables (BIND runs first)
    tri_up = _triples(spark, [
        ("a", "knows", "b"), ("c", "knows", "d"),
        ("A", "vip", "yes"),
    ])
    got_bind_exists = {r["x"] for r in sparql(tri_up, """
        SELECT ?x WHERE {
          ?x <knows> ?y . BIND(UCASE(?x) AS ?u)
          FILTER EXISTS { ?u <vip> ?v }
        }
    """).collect()}
    assert got_bind_exists == {"a"}
    # spec §8.1.1: an OPTIONAL-unbound shared var is NOT substituted —
    # it stays free in the EXISTS pattern and matches anything
    tri_opt = _triples(spark, [
        ("a", "knows", "b"), ("a", "nick", "n1"), ("c", "knows", "d"),
        ("n1", "tag", "t"),
    ])
    got_null_exists = {r["x"] for r in sparql(tri_opt, """
        SELECT ?x WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <nick> ?n }
          FILTER EXISTS { ?n <tag> ?t }
        }
    """).collect()}
    assert got_null_exists == {"a", "c"}  # c: ?n free -> pattern matches
    # BIND with a term-metadata builtin enables bind_term_meta
    tri_meta2 = _triples(spark, [
        ("s", "label", "Wort", True, "de", None),
    ], meta=True)
    got_bind_lang = [(r["o"], r["lg"]) for r in sparql(tri_meta2, """
        SELECT ?o ?lg WHERE { ?s <label> ?o . BIND(LANG(?o) AS ?lg) }
    """).collect()]
    assert got_bind_lang == [("Wort", "de")]

    # BIND: new column from the expression grammar; filters see it
    got12 = {(r["x"], r["pair"]) for r in sparql(tri, """
        SELECT ?x ?pair WHERE {
          ?x <knows> ?y .
          BIND(CONCAT(UCASE(?x), "-", ?y) AS ?pair)
          FILTER(STRLEN(?pair) = 3)
        }
    """).collect()}
    assert got12 == {("a", "A-b"), ("b", "B-c"), ("c", "C-d")}
    with pytest.raises(SparqlSyntaxError):  # rebinding a bound var
        sparql(tri, """
            SELECT ?x WHERE { ?x <knows> ?y . BIND(STR(?y) AS ?x) }
        """)


def test_parse_errors():
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?x WHERE { ?x ?p ?o } VALUES ?x { <a> }")
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?x WHERE { ?x qq:name ?o }")  # undeclared prefix
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("INSERT DATA { ?x <p> <o> }")  # non-ground insert
    # FILTER inside a UNION arm is in-subset since round 5
    parse_sparql("SELECT ?x WHERE { { ?x <p> ?o . FILTER(?x = 1) } UNION { ?x <q> ?o } }")
    # nested MINUS inside a UNION arm is in-subset since round 5
    parse_sparql("SELECT ?x WHERE { { ?x <p> ?o . MINUS { ?x <r> ?z } } UNION { ?x <q> ?o } }")
    with pytest.raises(SparqlSyntaxError):  # LIMIT must be an integer
        parse_sparql("SELECT ?x WHERE { ?x <p> ?o } LIMIT 3.5")


def test_regex_flags_and_subset_guards(spark):
    tri = _triples(spark, [
        ("a", "label", "ACME Corp"), ("b", "label", "acme corp"),
    ])
    # REGEX 3rd arg: 'i' compiles to Java's inline flag
    got = {r["x"] for r in sparql(
        tri, 'SELECT ?x WHERE { ?x <label> ?l . FILTER(REGEX(?l, "^acme", "i")) }'
    ).collect()}
    assert got == {"a", "b"}
    with pytest.raises(SparqlSyntaxError):  # unsupported flag
        sparql(tri, 'SELECT ?x WHERE { ?x <label> ?l . FILTER(REGEX(?l, "a", "q")) }')
    # property paths cannot instantiate update/construct templates
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "DELETE WHERE { ?a <p>+ ?b }")
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "CONSTRUCT { ?a <p>+ ?b } WHERE { ?a <label> ?b }")
    # term-metadata builtins over UNION: clear subset error, not a deep
    # AnalysisException from the missing metadata columns
    tri_meta = _triples(spark, [("a", "p", "b", False, None, None)], meta=True)
    with pytest.raises(SparqlSyntaxError):
        sparql(tri_meta, """
            SELECT ?o WHERE {
              { ?s <p> ?o } UNION { ?s <q> ?o } FILTER(isIRI(?o))
            }""")


def test_meta_builtins_require_columns(spark):
    tri = _triples(spark, [("a", "p", "b")])
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "SELECT ?o WHERE { ?s ?p ?o . FILTER(isIRI(?o)) }")


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_minus_exists_plan_no_nested_loop(spark):
    """Scale guard (VERDICT r4 finding #1): with no OPTIONAL/UNION/
    BIND/UNDEF upstream the left solution set provably has no NULL
    shared vars, so MINUS / [NOT] EXISTS must compile to plain hash
    anti/semi equi-joins — never a BroadcastNestedLoopJoin that
    broadcasts the whole probe pattern."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("b", "blocked", "y"),
    ])
    queries = [
        "SELECT ?x WHERE { ?x <knows> ?y . MINUS { ?x <blocked> ?z } }",
        "SELECT ?x WHERE { ?x <knows> ?y . "
        "FILTER NOT EXISTS { ?x <blocked> ?z } }",
        "SELECT ?x WHERE { ?x <knows> ?y . "
        "FILTER EXISTS { ?x <blocked> ?z } }",
    ]
    for q in queries:
        plan = _executed_plan(sparql(tri, q))
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)
        assert "CartesianProduct" not in plan, (q, plan)
    # semantics unchanged through the equi-join plan
    assert {r["x"] for r in sparql(tri, queries[0]).collect()} == {"a"}
    assert {r["x"] for r in sparql(tri, queries[1]).collect()} == {"a"}
    assert {r["x"] for r in sparql(tri, queries[2]).collect()} == {"b"}


def test_minus_exists_nullable_split_path(spark):
    """With OPTIONAL upstream the NULL-carrying remainder keeps the
    compatibility path, but the fully-bound partition still rides the
    hash equi-join: the plan may contain a BNLJ branch, yet semantics
    must match the spec on unbound shared vars."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("c", "knows", "d"),
        ("b", "nick", "bee"), ("b", "blocked", "bee"), ("a", "blocked", "x"),
    ])
    # ?n unbound for a and c -> compatible with any ?n; domain overlap
    # via ?x decides: a has blocked rows -> removed; c none -> kept;
    # b is bound n=bee and (b, blocked, bee) matches -> removed
    got = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <nick> ?n }
          MINUS { ?x <blocked> ?n }
        }
    """).collect()}
    assert got == {"c"}
    # NOT EXISTS substitution semantics: unbound ?n stays free, so the
    # probe only needs SOME blocked row for that ?x
    got2 = {r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <nick> ?n }
          FILTER NOT EXISTS { ?x <blocked> ?n }
        }
    """).collect()}
    assert got2 == {"c"}


def test_nested_join_plan_shapes(spark):
    """Scale guards for the round-5 ``sol_join`` split paths: a join
    whose shared variables include one CERTAINLY-bound variable must
    stay a hash join — the compat terms on the maybe-unbound shared
    vars ride as post-join predicates, never a BroadcastNestedLoopJoin
    over the whole solution set."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"),
        ("a", "nick", "ace"), ("a", "likes", "ace"), ("b", "likes", "z"),
    ])
    # shares x (certain) + n (OPTIONAL-maybe): equi anchor on x
    q1 = """
        SELECT ?x ?n WHERE {
          ?x <knows> ?y OPTIONAL { ?x <nick> ?n }
          { ?x <likes> ?n }
        }
    """
    plan = _executed_plan(sparql(tri, q1))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # unbound ?n (b) is compatible with ?n=z and coalesces to it;
    # bound ?n=ace (a) must agree with the likes row
    got = sorted((r["x"], r["n"]) for r in sparql(tri, q1).collect())
    assert got == [("a", "ace"), ("b", "z")]
    # uneven UNION arms joined on a certain var keep the hash join too
    q2 = """
        SELECT ?x WHERE {
          { ?x <knows> ?y } UNION { ?x <nick> ?n }
          ?x <likes> ?v
        }
    """
    plan2 = _executed_plan(sparql(tri, q2))
    assert "BroadcastNestedLoopJoin" not in plan2, plan2
    got2 = sorted(r["x"] for r in sparql(tri, q2).collect())
    assert got2 == ["a", "a", "b"]


def test_order_by_unprojected_var(spark):
    """ORDER BY on a variable outside the SELECT list is legal SPARQL
    (§15.1) — the sort must resolve against the pre-projection
    solutions."""
    tri = _triples(spark, [
        ("s1", "rank", "3"), ("s2", "rank", "1"), ("s3", "rank", "2"),
    ])
    rows = sparql(tri, """
        SELECT ?s WHERE { ?s <rank> ?o } ORDER BY ?o
    """).collect()
    assert [r["s"] for r in rows] == ["s2", "s3", "s1"]
    assert rows[0].asDict().keys() == {"s"}
    # DISTINCT + unprojected sort key is a spec error -> clear message
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "SELECT DISTINCT ?s WHERE { ?s <rank> ?o } ORDER BY ?o")
    # unbound sort key -> clear message, not an AnalysisException
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "SELECT ?s WHERE { ?s <rank> ?o } ORDER BY ?zzz")


def test_reserved_metadata_variable_names_rejected(spark):
    tri = _triples(spark, [("a", "p", "b")])
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, "SELECT ?x__lang WHERE { ?s ?p ?x__lang }")
    # a double underscore NOT matching a reserved suffix is a fine name
    got = {r["my__var"] for r in sparql(
        tri, "SELECT ?my__var WHERE { <a> <p> ?my__var }"
    ).collect()}
    assert got == {"b"}


def test_subqueries(spark):
    """Spec §12 subqueries: `{ SELECT ... }` evaluates independently
    and joins the enclosing group on its projected variables; only the
    projection is visible outside."""
    tri = _triples(spark, [
        ("a", "type", "T"), ("b", "type", "T"), ("c", "type", "U"),
        ("a", "amt", "10"), ("a", "amt", "32"), ("b", "amt", "5"),
        ("c", "amt", "99"),
    ])
    # aggregate subquery joined with an outer pattern
    got = sorted((r["s"], r["n"]) for r in sparql(tri, """
        SELECT ?s ?n WHERE {
          ?s <type> <T> .
          { SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s <amt> ?v } GROUP BY ?s }
        }
    """).collect())
    assert got == [("a", 2), ("b", 1)]
    # subquery-only WHERE body
    got2 = sorted(r["x"] for r in sparql(tri, """
        SELECT ?x WHERE { { SELECT DISTINCT ?x WHERE { ?x <amt> ?v } } }
    """).collect())
    assert got2 == ["a", "b", "c"]
    # the subquery's non-projected variables stay scoped inside: outer
    # ?v is a FRESH variable joined against nothing -> all amt rows
    got3 = sorted((r["x"], r["v"]) for r in sparql(tri, """
        SELECT ?x ?v WHERE {
          ?x <amt> ?v .
          { SELECT ?x WHERE { ?x <type> <T> } }
        }
    """).collect())
    assert got3 == [("a", "10"), ("a", "32"), ("b", "5")]
    # ORDER BY + LIMIT inside the subquery (top-1 by amount)
    got4 = [r["s"] for r in sparql(tri, """
        SELECT ?s WHERE {
          ?s <type> ?t .
          { SELECT ?s WHERE { ?s <amt> ?v } ORDER BY DESC(?v) LIMIT 1 }
        }
    """).collect()]
    assert got4 == ["c"]
    # MINUS against a subquery-derived base stays hash-planned (the
    # subquery projection is statically non-nullable)
    got5 = sorted(r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          { SELECT DISTINCT ?x WHERE { ?x <amt> ?v } }
          MINUS { ?x <type> <U> }
        }
    """).collect())
    assert got5 == ["a", "b"]
    # nullable projections are rejected honestly
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, """
            SELECT ?x WHERE {
              { SELECT ?x ?v WHERE {
                  ?x <type> <T> OPTIONAL { ?x <amt> ?v } } }
            }
        """)


def test_filter_inside_optional_and_union(spark):
    """VERDICT r4 next-step #4: group-scoped FILTERs. OPTIONAL{P
    FILTER e} is LeftJoin(A,P,e) — filter the optional solutions
    BEFORE the left join (unmatched-after-filter rows keep NULLs),
    NOT filter-after-join (which would drop them)."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "knows", "c"), ("c", "knows", "d"),
        ("a", "age", "30"), ("b", "age", "7"), ("d", "age", "99"),
    ])
    got = sorted((r["x"], r["n"]) for r in sparql(tri, """
        SELECT ?x ?n WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <age> ?n FILTER(?n > 10) }
        }
    """).collect())
    # b's age 7 fails the filter -> b KEEPS its row with unbound ?n
    assert got == [("a", "30"), ("b", None), ("c", None)]
    # arm-scoped UNION filters
    got2 = sorted(r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          { ?x <knows> ?y FILTER(STRSTARTS(?x, "a")) }
          UNION
          { ?x <age> ?n FILTER(?n < 10) }
        }
    """).collect())
    assert got2 == ["a", "b"]
    # UNION group followed by VALUES
    got3 = sorted(r["x"] for r in sparql(tri, """
        SELECT ?x WHERE {
          { ?x <knows> ?y } UNION { ?x <age> ?n }
          VALUES ?x { <a> <d> UNDEF }
        }
    """).collect())
    # multiset semantics: a solution compatible with BOTH a bound row
    # and the UNDEF wildcard row joins twice (a: 2 sols x 2 rows,
    # b: 2 x 1, c: 1 x 1, d: 1 x 2)
    assert got3 == ["a", "a", "a", "a", "b", "b", "c", "d", "d"]
    # a filter referencing OUTER variables is the LeftJoin condition
    # (in-subset since late round 5): evaluated over base+body, a
    # failing/erroring condition keeps the base row with ?n unbound.
    # ?n > ?y compares lexical forms: a(30>"b") false, b(7>"c") false,
    # c has no age -> every base row keeps an unbound ?n
    got_outer = sorted((r["x"], r["n"]) for r in sparql(tri, """
        SELECT ?x ?n WHERE {
          ?x <knows> ?y . OPTIONAL { ?x <age> ?n FILTER(?n > ?y) }
        }
    """).collect())
    assert got_outer == [("a", None), ("b", None), ("c", None)]
    # FILTER EXISTS inside an OPTIONAL body (in-subset since round 5):
    # scoped to the body, evaluated BEFORE the left join — d's age row
    # fails EXISTS (d has no <knows> edge) but d never matched; b's
    # body row survives EXISTS, a's too, c keeps its unmatched NULL
    got4 = sorted((r["x"], r["n"]) for r in sparql(tri, """
        SELECT ?x ?n WHERE {
          ?x <knows> ?y .
          OPTIONAL { ?x <age> ?n FILTER EXISTS { ?x <knows> ?z } }
        }
    """).collect())
    assert got4 == [("a", "30"), ("b", "7"), ("c", None)]
