"""Fuseki connector against an in-process stub implementing the SPARQL
Graph Store protocol endpoints the reference manager uses (PUT
/ds/data?graph=, GET /ds/get?graph=, POST /ds/sparql)."""

import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ontocast_spark.sources.fuseki import (
    FusekiClient,
    write_facts_fuseki,
    write_ontology_fuseki,
)

GRAPHS: dict[str, str] = {}
OWL_ONTOLOGY = "http://www.w3.org/2002/07/owl#Ontology"


class StubFuseki(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _graph_param(self):
        q = urllib.parse.urlparse(self.path).query
        return urllib.parse.parse_qs(q).get("graph", [None])[0]

    def do_PUT(self):
        if self.path.startswith("/ds/data"):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            GRAPHS[self._graph_param()] = body.decode("utf-8")
            self.send_response(204)
            self.end_headers()
        else:
            self.send_response(404)
            self.end_headers()

    def do_GET(self):
        if self.path.startswith("/ds/get"):
            g = GRAPHS.get(self._graph_param())
            if g is None:
                self.send_response(404)
                self.end_headers()
                return
            body = g.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/turtle")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        if self.path.startswith("/ds/sparql"):
            self.rfile.read(int(self.headers["Content-Length"]))
            # stub discovery: every graph whose turtle mentions
            # owl:Ontology and the graph IRI as subject
            bindings = [
                {"s": {"type": "uri", "value": iri}}
                for iri, ttl in GRAPHS.items()
                if "owl#Ontology" in ttl or "owl:Ontology" in ttl
            ]
            body = json.dumps({"results": {"bindings": bindings}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/sparql-results+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def fuseki_url():
    GRAPHS.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), StubFuseki)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_put_get_roundtrip(fuseki_url):
    client = FusekiClient(fuseki_url, "ds", auth=("u", "p"))
    ttl = '<https://x/s> <https://x/p> "v"@en .\n'
    assert client.put_graph("https://x/graph1", ttl)
    triples, _ = client.get_graph("https://x/graph1")
    assert triples == [("https://x/s", "https://x/p", "v", True, "@en")]


def test_fetch_ontology_index(fuseki_url):
    client = FusekiClient(fuseki_url, "ds")
    onto_ttl = (
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "<https://ex.com/fin> a owl:Ontology .\n"
        '<https://ex.com/fin#Organization> a owl:Class ; rdfs:label "organization" .\n'
        "<https://ex.com/fin#employs> a owl:ObjectProperty ;\n"
        '    rdfs:label "employs" ;\n'
        "    rdfs:domain <https://ex.com/fin#Organization> .\n"
    )
    client.put_graph("https://ex.com/fin", onto_ttl)
    index = client.fetch_ontology_index()
    kinds = {(t.term_iri, t.kind) for t in index.terms}
    assert ("https://ex.com/fin#Organization", "class") in kinds
    assert ("https://ex.com/fin#employs", "property") in kinds


def test_distributed_facts_sink(spark, fuseki_url):
    from ontocast_spark.pipeline import run_pipeline

    conv = spark.createDataFrame(
        [
            ("c1", 0, "user", "Acme Corp employs Dana Fox.", None, None),
            ("c2", 0, "user", "Beta Inc employs Alice Reed.", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = run_pipeline(spark, conv)
    n = write_facts_fuseki(out["kg_triples"], fuseki_url, "ds")
    assert n == 2  # one named graph per conversation, PUT from executors
    stored = [g for g in GRAPHS.values() if "Dana Fox" in g]
    assert stored and '"Dana Fox"' in stored[0]

    ok = write_ontology_fuseki(
        out["ontology_alignments"], "https://example.com/onto", fuseki_url, "ds"
    )
    assert ok
    triples, _ = FusekiClient(fuseki_url, "ds").get_graph(
        "https://example.com/onto"
    )
    assert ("https://example.com/onto",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            OWL_ONTOLOGY, False, None) in triples


def test_neo4j_admin_csv_export(spark, tmp_path):
    """S6/S8 bulk-load contract: distributed nodes/relationships CSV
    parts in admin-import shape; literals stay out of the rel file."""
    import glob

    from ontocast_spark.schemas import TRIPLES
    from ontocast_spark.sources.neo4j_export import export_neo4j_admin_csv

    L = "http://www.w3.org/2000/01/rdf-schema#label"
    ns = "https://x/doc/1/chunk/c1/"
    rows = [
        ("c1", "https://x/doc/1", "h1", ns, ns + "acme", L, "Acme Corp", True, None),
        ("c1", "https://x/doc/1", "h1", ns, ns + "acme",
         "https://ex.com/fin#employs", ns + "dana", False, None),
        ("c1", "https://x/doc/1", "h1", ns, ns + "dana", L, "Dana Fox", True, None),
    ]
    df = spark.createDataFrame(rows, TRIPLES)
    out = str(tmp_path / "neo4j")
    nodes_dir, rels_dir = export_neo4j_admin_csv(df, out)

    def read_parts(d):
        lines = []
        for p in glob.glob(os.path.join(d, "part-*")):
            lines += [ln for ln in open(p).read().splitlines() if ln]
        return lines

    nodes = read_parts(nodes_dir)
    rels = read_parts(rels_dir)
    assert f'"{ns}acme","Acme Corp",Resource' in nodes
    assert f'"{ns}dana","Dana Fox",Resource' in nodes
    assert len(nodes) == 2
    assert rels == [
        f'"{ns}acme","{ns}dana","EMPLOYS","https://ex.com/fin#employs"'
    ]
    assert os.path.exists(os.path.join(out, "IMPORT.md"))
