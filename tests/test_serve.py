"""HTTP serve mode: /health, /info, /process lifecycle parity with the
reference's MCP server (cli/serve.py), over stdlib urllib."""

import json
import urllib.error
import urllib.request

import pytest

from ontocast_spark.serve import serve
from ontocast_spark.sources.turtle import parse_turtle


@pytest.fixture(scope="module")
def server(spark):
    srv = serve(spark, host="127.0.0.1", port=0)  # ephemeral port
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, body: bytes, ctype: str):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_info(server):
    code, body = _get(server + "/health")
    assert code == 200 and body["status"] == "healthy"
    code, body = _get(server + "/info")
    assert code == 200
    assert body["name"] == "ontocast-spark"
    assert "text-to-triples" in body["capabilities"]


def test_process_json_payload(server):
    payload = json.dumps({"text": "Acme Corp employs Dana Fox."}).encode()
    code, body = _post(server + "/process", payload, "application/json")
    assert code == 200 and body["status"] == "success"
    facts, _ = parse_turtle(body["data"]["facts"])
    labels = {o for _, p, o, lit, _ in facts if lit}
    assert "Dana Fox" in labels and "Acme Corp" in labels
    onto, _ = parse_turtle(body["data"]["ontology"])
    assert onto  # term declarations emitted
    assert body["metadata"]["n_fact_triples"] == len(facts)


def test_process_plain_text(server):
    code, body = _post(
        server + "/process", b"Beta Inc employs Alice Reed.", "text/plain"
    )
    assert code == 200 and body["status"] == "success"
    assert "Alice Reed" in body["data"]["facts"]


def test_process_rejects_unknown_content_type(server):
    code, body = _post(server + "/process", b"x", "application/octet-stream")
    assert code == 400 and body["error_type"] == "ValidationError"
