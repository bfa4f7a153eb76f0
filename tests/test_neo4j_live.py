"""Neo4j live connector against an in-process stub implementing the
HTTP transactional Cypher endpoint (POST /db/neo4j/tx/commit) over an
in-memory :Resource property graph — the same stub-server pattern as
tests/test_fuseki.py. Exercises the exact statements the module issues
(reference flows: neo4j.py:211-371 ontology fetch, neo4j.py:29-141
facts write)."""

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ontocast_spark.sources import neo4j_live as mod
from ontocast_spark.sources.neo4j_live import (
    Neo4jHttpClient,
    fetch_graph_triples,
    fetch_ontology_iris,
    make_client,
    register_bolt_client,
    write_conversation_graph,
    write_facts_neo4j,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_ONTOLOGY = "http://www.w3.org/2002/07/owl#Ontology"

# in-memory graph: nodes[uri] = {prop: value}; rels = {(s, type, o)}
NODES: dict[str, dict] = {}
RELS: set[tuple] = set()

_REL_TYPE_RE = re.compile(r"MERGE \(s\)-\[r:`((?:[^`]|``)*)`\]->\(o\)")


def _execute(statement: str, params: dict) -> list[dict]:
    """Interpret exactly the Cypher templates neo4j_live issues."""
    if statement == mod._DISCOVER_CYPHER:
        iris = sorted(
            s for (s, t, o) in RELS
            if t == params["rdf_type"] and o == params["owl_ontology"]
        )
        return [{"iri": i} for i in iris]
    if statement == mod._RELS_CYPHER:
        ns = params["ns"]
        rows = sorted(
            (s, t, o) for (s, t, o) in RELS if s.startswith(ns)
        )
        return [{"subj": s, "pred": t, "obj": o} for s, t, o in rows]
    if statement == mod._PROPS_CYPHER:
        ns = params["ns"]
        rows = []
        for uri in sorted(NODES):
            if not uri.startswith(ns):
                continue
            for k in sorted(NODES[uri]):
                rows.append({"subj": uri, "pred": k, "obj": NODES[uri][k]})
        return rows
    if statement == mod._SET_PROP_CYPHER:
        for row in params["rows"]:
            NODES.setdefault(row["subj"], {}).update(row["props"])
        return [{"n": len(params["rows"])}]
    m = _REL_TYPE_RE.search(statement)
    if m:
        rel_type = m.group(1).replace("``", "`")
        for row in params["rows"]:
            NODES.setdefault(row["subj"], {})
            NODES.setdefault(row["obj"], {})
            RELS.add((row["subj"], rel_type, row["obj"]))
        return [{"n": len(params["rows"])}]
    raise AssertionError(f"stub got unexpected cypher: {statement!r}")


class StubNeo4j(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        if not self.path.endswith("/tx/commit"):
            self.send_response(404)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        results, errors = [], []
        for st in body.get("statements", []):
            try:
                rows = _execute(st["statement"], st.get("parameters", {}))
                cols = sorted(rows[0]) if rows else []
                results.append({
                    "columns": cols,
                    "data": [{"row": [r[c] for c in cols]} for r in rows],
                })
            except AssertionError as e:
                errors.append({"code": "stub", "message": str(e)})
        out = json.dumps({"results": results, "errors": errors}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture(scope="module")
def neo4j_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), StubNeo4j)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


@pytest.fixture(autouse=True)
def _clean_graph():
    NODES.clear()
    RELS.clear()
    yield


def test_write_then_fetch_roundtrip(neo4j_url):
    client = Neo4jHttpClient(neo4j_url)
    triples = [
        ("https://kg/acme", RDF_TYPE, "https://onto/Company", False, None),
        ("https://kg/acme", "https://w3/label", "Acme Corp", True, None),
        ("https://kg/acme", "https://onto/employs", "https://kg/dana", False, None),
        ("https://kg/dana", "https://w3/label", "Dana Fox", True, None),
    ]
    n = write_conversation_graph(client, triples)
    assert n == 3  # one property batch + two relationship types
    got = set(map(tuple, fetch_graph_triples(client, "https://kg/")))
    assert got == {
        ("https://kg/acme", RDF_TYPE, "https://onto/Company", False, None),
        ("https://kg/acme", "https://w3/label", "Acme Corp", True, None),
        ("https://kg/acme", "https://onto/employs", "https://kg/dana", False, None),
        ("https://kg/dana", "https://w3/label", "Dana Fox", True, None),
    }


def test_ontology_discovery_and_index(neo4j_url):
    client = Neo4jHttpClient(neo4j_url)
    onto = "https://onto/fin"
    write_conversation_graph(client, [
        (onto, RDF_TYPE, OWL_ONTOLOGY, False, None),
        (onto + "#Company", RDF_TYPE,
         "http://www.w3.org/2002/07/owl#Class", False, None),
        (onto + "#Company", "http://www.w3.org/2000/01/rdf-schema#label",
         "Company", True, None),
    ])
    assert fetch_ontology_iris(client) == [onto]
    idx = mod.fetch_ontology_index(client)
    assert any(t.label == "Company" for t in idx.terms)


def test_distributed_facts_sink(spark, neo4j_url):
    facts = spark.createDataFrame(
        [
            ("c1", "https://kg/a", "https://onto/knows", "https://kg/b", False),
            ("c1", "https://kg/a", "https://w3/label", "A", True),
            ("c2", "https://kg/c", "https://onto/knows", "https://kg/d", False),
        ],
        "conv_id string, subj string, pred string, obj string, "
        "obj_is_literal boolean",
    )
    assert write_facts_neo4j(facts, neo4j_url) == 2
    assert ("https://kg/a", "https://onto/knows", "https://kg/b") in RELS
    assert ("https://kg/c", "https://onto/knows", "https://kg/d") in RELS
    assert NODES["https://kg/a"]["https://w3/label"] == "A"


def test_transport_resolution(neo4j_url):
    # http URI with no bolt driver -> HTTP client
    assert isinstance(make_client(neo4j_url), Neo4jHttpClient)
    # bolt URI with no driver and no registration -> honest refusal
    with pytest.raises(NotImplementedError):
        make_client("bolt://localhost:7687")
    # registered factory wins
    sentinel = object()
    register_bolt_client(lambda uri, auth, db: sentinel)
    try:
        assert make_client("bolt://localhost:7687") is sentinel
    finally:
        register_bolt_client(None)


def test_backtick_rel_type_escaped(neo4j_url):
    client = Neo4jHttpClient(neo4j_url)
    write_conversation_graph(client, [
        ("https://kg/x", "https://p/we`ird", "https://kg/y", False, None),
    ])
    assert ("https://kg/x", "https://p/we`ird", "https://kg/y") in RELS


def test_unwind_batches_are_bounded(neo4j_url):
    """A large conversation must not ship one unbounded UNWIND payload:
    rows chunk into batch_rows-sized statements, and because MERGE /
    last-wins SET += are idempotent over the sorted replay, the written
    graph is identical to the single-statement result."""
    client = Neo4jHttpClient(neo4j_url)
    triples = (
        [(f"https://kg/n{i:04d}", "https://w3/label", f"L{i}", True, None)
         for i in range(10)]
        + [(f"https://kg/n{i:04d}", "https://onto/knows",
            f"https://kg/n{(i + 1) % 10:04d}", False, None)
           for i in range(10)]
    )
    n = write_conversation_graph(client, triples, batch_rows=3)
    # 10 props -> 4 statements, 10 rels of one type -> 4 statements
    assert n == 8
    got = set(map(tuple, fetch_graph_triples(client, "https://kg/")))
    assert got == {tuple(t) for t in triples}
