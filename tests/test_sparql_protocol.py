"""Serve-mode /sparql endpoint (SPARQL 1.1 Protocol over the server's
KG store) and the query engine's SERVICE clause federating into it.
Reference lifecycle: the reference processes documents, PUTs facts to
Fuseki, and queries them over Fuseki's protocol endpoint
(cli/serve.py + fuseki.py:188-270); serve.py plays both roles here."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from ontocast_spark.plans import sparql as sparql_mod
from ontocast_spark.plans.sparql import (
    SparqlServiceError,
    SparqlSyntaxError,
    register_service_client,
    sparql,
)
from ontocast_spark.serve import serve

EX = "http://example.org/"

SEED = [
    (EX + "ada", EX + "name", "Ada", True, None),
    (EX + "ada", EX + "age", "36", True,
     "http://www.w3.org/2001/XMLSchema#integer"),
    (EX + "bob", EX + "name", "Bob", True, None),
    (EX + "ada", EX + "knows", EX + "bob", False, None),
]


@pytest.fixture(scope="module")
def server(spark):
    srv = serve(spark, host="127.0.0.1", port=0, triples=list(SEED))
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get_query(server, q):
    url = server + "/sparql?" + urllib.parse.urlencode({"query": q})
    with urllib.request.urlopen(url, timeout=60) as r:
        ctype = r.headers.get("Content-Type")
        return r.status, ctype, r.read().decode()


def _post(server, body: bytes, ctype: str):
    req = urllib.request.Request(
        server + "/sparql", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


# ------------------------------------------------------ protocol: query


def test_select_json_results_format(server):
    code, ctype, body = _get_query(
        server,
        f'SELECT ?s ?n WHERE {{ ?s <{EX}name> ?n }} ORDER BY ?n',
    )
    assert code == 200 and ctype == "application/json"
    doc = json.loads(body)
    assert doc["head"]["vars"] == ["s", "n"]
    rows = [
        (b["s"]["type"], b["s"]["value"], b["n"]["type"], b["n"]["value"])
        for b in doc["results"]["bindings"]
    ]
    assert rows == [
        ("uri", EX + "ada", "literal", "Ada"),
        ("uri", EX + "bob", "literal", "Bob"),
    ]


def test_select_unbound_omitted_from_binding(server):
    code, _, body = _get_query(server, f"""
        SELECT ?s ?who WHERE {{
            ?s <{EX}name> ?n
            OPTIONAL {{ ?s <{EX}knows> ?who }}
        }} ORDER BY ?s
    """)
    assert code == 200
    bindings = json.loads(body)["results"]["bindings"]
    assert "who" in bindings[0] and bindings[0]["who"]["value"] == EX + "bob"
    assert "who" not in bindings[1]  # unbound: key omitted per spec


def test_ask_and_construct(server):
    code, _, body = _get_query(
        server, f'ASK {{ <{EX}ada> <{EX}knows> ?x }}'
    )
    assert code == 200 and json.loads(body) == {"head": {}, "boolean": True}

    code, ctype, body = _get_query(server, f"""
        CONSTRUCT {{ ?a <{EX}linked> ?b }}
        WHERE {{ ?a <{EX}knows> ?b }}
    """)
    assert code == 200 and ctype == "text/turtle"
    assert "linked" in body and "ada" in body and "bob" in body


def test_post_direct_and_form_encoded(server):
    q = f'SELECT ?n WHERE {{ <{EX}ada> <{EX}name> ?n }}'
    code, body = _post(server, q.encode(), "application/sparql-query")
    assert code == 200
    assert json.loads(body)["results"]["bindings"][0]["n"]["value"] == "Ada"

    form = urllib.parse.urlencode({"query": q}).encode()
    code, body = _post(server, form, "application/x-www-form-urlencoded")
    assert code == 200
    assert json.loads(body)["results"]["bindings"][0]["n"]["value"] == "Ada"


def test_syntax_error_is_400(server):
    code, body = _post(
        server, b"SELECT WHERE", "application/sparql-query"
    )
    assert code == 400
    assert json.loads(body)["error_type"] == "SparqlSyntaxError"


# ----------------------------------------------------- protocol: update


def test_update_roundtrip(server):
    ins = (f'INSERT DATA {{ <{EX}cai> <{EX}name> "Cai" }}').encode()
    code, body = _post(server, ins, "application/sparql-update")
    assert code == 200 and json.loads(body)["status"] == "success"

    code, _, body = _get_query(
        server, f'SELECT ?n WHERE {{ <{EX}cai> <{EX}name> ?n }}'
    )
    assert [b["n"]["value"]
            for b in json.loads(body)["results"]["bindings"]] == ["Cai"]

    form = urllib.parse.urlencode(
        {"update": f'DELETE WHERE {{ <{EX}cai> <{EX}name> ?n }}'}
    ).encode()
    code, _ = _post(server, form, "application/x-www-form-urlencoded")
    assert code == 200
    code, _, body = _get_query(
        server, f'ASK {{ <{EX}cai> <{EX}name> ?n }}'
    )
    assert json.loads(body)["boolean"] is False


# -------------------------------------------------- SERVICE federation


def _local_triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_service_federates_against_live_endpoint(spark, server):
    """A local query joins its solutions with bindings fetched from the
    serve-mode endpoint over real HTTP — two deployments federating."""
    local = _local_triples(spark, [
        (EX + "ada", EX + "team", "blue"),
        (EX + "bob", EX + "team", "red"),
        (EX + "zoe", EX + "team", "blue"),  # unknown remotely -> drops
    ])
    out = sparql(local, f"""
        SELECT ?s ?t ?n WHERE {{
            ?s <{EX}team> ?t
            SERVICE <{server}/sparql> {{ ?s <{EX}name> ?n }}
        }} ORDER BY ?n
    """)
    got = [(r["s"], r["t"], r["n"]) for r in out.collect()]
    assert got == [
        (EX + "ada", "blue", "Ada"),
        (EX + "bob", "red", "Bob"),
    ]


def test_service_prefixes_reach_remote(spark, server):
    local = _local_triples(spark, [(EX + "ada", EX + "team", "blue")])
    out = sparql(local, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
            ?s ex:team "blue"
            SERVICE <{server}/sparql> {{ ?s ex:name ?n }}
        }}
    """)
    assert [r["n"] for r in out.collect()] == ["Ada"]


def test_service_silent_failure_is_unit_solution(spark):
    local = _local_triples(spark, [(EX + "ada", EX + "team", "blue")])
    out = sparql(local, f"""
        SELECT ?s WHERE {{
            ?s <{EX}team> "blue"
            SERVICE SILENT <http://127.0.0.1:9/sparql> {{ ?s <{EX}x> ?y }}
        }}
    """)
    assert [r["s"] for r in out.collect()] == [EX + "ada"]


def test_service_loud_failure_raises(spark):
    local = _local_triples(spark, [(EX + "ada", EX + "team", "blue")])
    with pytest.raises(SparqlServiceError):
        sparql(local, f"""
            SELECT ?s WHERE {{
                ?s <{EX}team> "blue"
                SERVICE <http://127.0.0.1:9/sparql> {{ ?s <{EX}x> ?y }}
            }}
        """).collect()


def test_service_guards(spark):
    local = _local_triples(spark, [(EX + "a", EX + "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="endpoint"):
        sparql(local, "SELECT ?s WHERE { SERVICE ?e { ?s ?p ?o } }")
    with pytest.raises(SparqlSyntaxError, match="at least one variable"):
        sparql(local, f"""
            SELECT ?s WHERE {{
                ?s <{EX}p> ?o
                SERVICE <http://x/sparql> {{ <{EX}a> <{EX}p> <{EX}b> }}
            }}
        """)


def test_service_stub_client_unbound_rows(spark):
    """A registered transport replaces urllib; remote bindings with
    missing slots join null-safely (remote OPTIONAL semantics)."""
    def stub(endpoint, query):
        assert "SELECT * WHERE" in query
        return {
            "head": {"vars": ["s", "extra"]},
            "results": {"bindings": [
                {"s": {"type": "uri", "value": EX + "ada"},
                 "extra": {"type": "literal", "value": "yes"}},
                {"s": {"type": "uri", "value": EX + "bob"}},  # no extra
            ]},
        }

    register_service_client(stub)
    try:
        local = _local_triples(spark, [
            (EX + "ada", EX + "team", "blue"),
            (EX + "bob", EX + "team", "red"),
        ])
        out = sparql(local, f"""
            SELECT ?s ?extra WHERE {{
                ?s <{EX}team> ?t
                SERVICE <http://stubbed/sparql> {{ ?s <{EX}e> ?extra }}
            }} ORDER BY ?s
        """)
        got = [(r["s"], r["extra"]) for r in out.collect()]
        assert got == [(EX + "ada", "yes"), (EX + "bob", None)]
    finally:
        register_service_client(None)
    assert sparql_mod._SERVICE_CLIENT is None


# ------------------------------------- Graph Store Protocol interop


def test_fuseki_client_against_serve_endpoint(spark):
    """Full interop loop, no stubs: our own FusekiClient (the class
    the distributed sinks use) runs the reference's complete
    store-lifecycle against OUR serve endpoint — Graph Store PUT/GET
    plus the real two-step ontology discovery (GRAPH-inside-UNION
    SPARQL, then per-graph fetch). The serve endpoint is standing in
    for Fuseki exactly where the reference deploys Fuseki."""
    from ontocast_spark.sources.fuseki import FusekiClient

    srv = serve(spark, host="127.0.0.1", port=0)
    try:
        client = FusekiClient(
            f"http://127.0.0.1:{srv.server_address[1]}", "ds"
        )
        # Graph Store PUT / GET round-trip (incl. a language tag)
        ttl = '<https://x/s> <https://x/p> "v"@en .\n'
        assert client.put_graph("https://x/graph1", ttl)
        triples, _ = client.get_graph("https://x/graph1")
        assert triples == [("https://x/s", "https://x/p", "v", True, "@en")]

        # two-step discovery + fetch: the reference's fetch_ontology_index
        onto_ttl = (
            "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
            "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
            "<https://ex.com/fin> a owl:Ontology .\n"
            "<https://ex.com/fin#Organization> a owl:Class ; "
            'rdfs:label "organization" .\n'
        )
        client.put_graph("https://ex.com/fin", onto_ttl)
        index = client.fetch_ontology_index()
        kinds = {(t.term_iri, t.kind) for t in index.terms}
        assert ("https://ex.com/fin#Organization", "class") in kinds

        # PUT replaces; POST merges
        assert client.put_graph(
            "https://x/graph1", '<https://x/s2> <https://x/p> "w" .\n'
        )
        triples, _ = client.get_graph("https://x/graph1")
        assert [t[0] for t in triples] == ["https://x/s2"]
    finally:
        srv.shutdown()


def test_gsp_default_graph_and_named_isolation(spark):
    import urllib.request

    srv = serve(spark, host="127.0.0.1", port=0, triples=list(SEED))
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        # named-graph rows are invisible to plain (default-graph) BGPs
        from ontocast_spark.sources.fuseki import FusekiClient

        client = FusekiClient(base, "ds")
        client.put_graph("https://g/1", f'<{EX}zoe> <{EX}name> "Zoe" .\n')
        code, _, body = _get_query(
            base, f"SELECT ?n WHERE {{ ?s <{EX}name> ?n }} ORDER BY ?n"
        )
        names = [b["n"]["value"]
                 for b in json.loads(body)["results"]["bindings"]]
        assert names == ["Ada", "Bob"]  # Zoe only via GRAPH
        code, _, body = _get_query(base, f"""
            SELECT ?n WHERE {{ GRAPH <https://g/1> {{ ?s <{EX}name> ?n }} }}
        """)
        assert [b["n"]["value"]
                for b in json.loads(body)["results"]["bindings"]] == ["Zoe"]
        # default graph readable over GSP without a graph param
        with urllib.request.urlopen(base + "/ds/get", timeout=60) as r:
            assert "Ada" in r.read().decode()
    finally:
        srv.shutdown()


def test_distributed_sink_against_serve_endpoint(spark):
    """The executor-side facts sink (write_facts_fuseki: one named
    graph per conversation, PUT from applyInPandas workers) lands in
    OUR serve endpoint, then the graphs read back over SPARQL — the
    reference's store round-trip with Spark doing the distributed
    writes and no stub server."""
    from ontocast_spark.sources.fuseki import write_facts_fuseki

    srv = serve(spark, host="127.0.0.1", port=0)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        kg = spark.createDataFrame(
            [
                ("c1", "https://g/c1", EX + "a", EX + "name", "Ada",
                 True, None),
                ("c1", "https://g/c1", EX + "a", EX + "knows", EX + "b",
                 False, None),
                ("c2", "https://g/c2", EX + "b", EX + "name", "Bob",
                 True, None),
            ],
            "conv_id string, doc_iri string, subj string, pred string, "
            "obj string, obj_is_literal boolean, obj_datatype string",
        )
        assert write_facts_fuseki(kg, base, "ds") == 2
        code, _, body = _get_query(base, """
            SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
            GROUP BY ?g ORDER BY ?g
        """)
        assert code == 200
        got = [(b["g"]["value"], b["n"]["value"])
               for b in json.loads(body)["results"]["bindings"]]
        assert got == [("https://g/c1", "2"), ("https://g/c2", "1")]
    finally:
        srv.shutdown()


def test_boolean_bindings_use_xsd_lexical_forms(server):
    code, _, body = _get_query(server, f"""
        SELECT ?s (STRLEN(?n) = 3 AS ?three)
        WHERE {{ ?s <{EX}name> ?n }} ORDER BY ?s
    """)
    assert code == 200
    vals = {b["three"]["value"]
            for b in json.loads(body)["results"]["bindings"]}
    assert vals == {"true"}  # not Python's "True"


def test_gsp_delete_graph(spark):
    from ontocast_spark.sources.fuseki import FusekiClient

    srv = serve(spark, host="127.0.0.1", port=0)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        client = FusekiClient(base, "ds")
        client.put_graph("https://g/x", '<https://a> <https://p> "1" .\n')
        req = urllib.request.Request(
            base + "/ds/data?graph=" + urllib.parse.quote(
                "https://g/x", safe=""),
            method="DELETE",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
        code, _, body = _get_query(
            base, "ASK { GRAPH <https://g/x> { ?s ?p ?o } }"
        )
        assert json.loads(body)["boolean"] is False
        # deleting a missing graph is 404
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
