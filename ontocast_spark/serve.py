"""HTTP serve mode: the reference's MCP-style request lifecycle
(/root/reference/ontocast/cli/serve.py:64-230 — Robyn app with
GET /health, GET /info, POST /process) re-expressed over the Spark
pipeline with stdlib ``http.server`` (no web framework in this env).

POST /process accepts ``application/json`` ``{"text": ...}`` (the
reference's input.json payload) or ``text/plain`` bodies, runs the full
KG pipeline on a single-document conversation, and returns the MCP
response shape: ``{"status": "success", "data": {"facts": <turtle>,
"ontology": <turtle>}, "metadata": {...}}``.

This is the *interactive* lifecycle — one document per request through
the same SparkSession (requests serialize on a lock; Spark's scheduler
is thread-safe but per-request isolation keeps latency predictable).
The batch CLI (cli.py) and Structured Streaming (streaming/stream.py)
remain the 100-TB paths; serve mode exists for request/response parity
with the reference.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

INFO = {
    "name": "ontocast-spark",
    "version": "0.2.0",
    "description": "PySpark-native ontology-assisted KG construction",
    "capabilities": ["text-to-triples", "ontology-extraction"],
    "input_types": ["text", "json"],
    "output_types": ["turtle", "json"],
    "engine": "pyspark",
}


def process_text(
    spark: SparkSession, text: str, index=None, max_chunks: int | None = None
) -> dict:
    """One-document run -> MCP result dict (facts + ontology Turtle)."""
    from .ontology import builtin_ontology_index
    from .pipeline import PipelineConfig, run_pipeline
    from .schemas import merge_lang_expr
    from .sources.turtle import serialize_turtle

    index = index or builtin_ontology_index()
    conv = spark.createDataFrame(
        [("req", 0, "user", text, None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = run_pipeline(
        spark, conv, index=index, config=PipelineConfig(max_chunks=max_chunks)
    )

    def rows_to_tuples(df):
        if "obj_lang" in df.columns:
            df = df.withColumn("obj_datatype", merge_lang_expr()).drop("obj_lang")
        return [
            (r["subj"], r["pred"], r["obj"], bool(r["obj_is_literal"]),
             r["obj_datatype"])
            for r in df.select(
                "subj", "pred", "obj", "obj_is_literal", "obj_datatype"
            ).collect()
        ]

    facts = rows_to_tuples(out["kg_triples"])
    onto = rows_to_tuples(out["ontology_alignments"])
    return {
        "status": "success",
        "data": {
            "facts": serialize_turtle(facts),
            "ontology": serialize_turtle(onto),
        },
        "metadata": {
            "status": "succeeded",
            "n_fact_triples": len(facts),
            "n_ontology_triples": len(onto),
        },
    }


def make_handler(spark: SparkSession, index=None):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test servers
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                try:
                    spark.sql("SELECT 1").collect()
                    self._reply(200, {"status": "healthy"})
                except Exception as e:  # pragma: no cover
                    self._reply(500, {"status": "unhealthy", "error": str(e)})
            elif self.path == "/info":
                self._reply(200, INFO)
            else:
                self._reply(404, {"status": "error", "error": "not found"})

        def do_POST(self):
            if self.path != "/process":
                self._reply(404, {"status": "error", "error": "not found"})
                return
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if ctype == "application/json":
                try:
                    text = json.loads(raw.decode("utf-8")).get("text", "")
                except Exception as e:
                    self._reply(
                        400,
                        {"status": "error", "error": str(e),
                         "error_type": "ValidationError"},
                    )
                    return
            elif ctype.startswith("text/"):
                text = raw.decode("utf-8", errors="replace")
            else:
                self._reply(
                    400,
                    {"status": "error",
                     "error": f"Unsupported content type: {ctype}",
                     "error_type": "ValidationError"},
                )
                return
            try:
                with lock:
                    result = process_text(spark, text, index=index)
                self._reply(200, result)
            except Exception as e:  # pragma: no cover
                self._reply(
                    500,
                    {"status": "error", "error": str(e),
                     "error_type": type(e).__name__},
                )

    return Handler


def serve(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 8999, index=None
) -> ThreadingHTTPServer:
    """Start the HTTP server (non-blocking; returns the server — call
    ``.shutdown()`` to stop). CLI: ``python -m ontocast_spark.serve``."""
    server = ThreadingHTTPServer((host, port), make_handler(spark, index))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def main(argv=None) -> None:  # pragma: no cover
    import argparse

    from .session import build_spark

    ap = argparse.ArgumentParser(description="ontocast_spark serve mode")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8999)
    ap.add_argument("--ontology-dir", default=None)
    args = ap.parse_args(argv)
    index = None
    if args.ontology_dir:
        from .sources.documents import load_ontology_dir

        index = load_ontology_dir(args.ontology_dir)
    spark = build_spark(app_name="ontocast-serve")
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(spark, index)
    )
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
