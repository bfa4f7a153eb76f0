"""Neo4j bulk-load exporter (S6/S8 analog): the `neo4j-admin database
import` / n10s contract, produced distributed.

The reference writes per-document via a live bolt session + the n10s
(neosemantics) plugin (/root/reference/ontocast/tool/triple_manager/
neo4j.py:29-141: `:Resource {uri}` nodes with a unique-uri constraint,
n10s RDF import). No bolt driver exists in this environment, and a
per-row bolt session is the wrong shape at 10^12 turns anyway — every
production Neo4j bulk load goes through either

1. **n10s RDF import** — `CALL n10s.rdf.import.fetch(<file>,
   "N-Triples")` over the N-Triples export (sources/ntriples.py
   already emits it, one file per task), or
2. **neo4j-admin import CSVs** — nodes/relationships files with
   the admin-import header convention, which this module produces as
   plain distributed DataFrame writes (no driver bottleneck).

Mapping (mirrors the n10s property-graph projection the reference
reads back): every IRI subject/object becomes a ``:Resource`` node
keyed by ``uri:ID``; IRI-object triples become relationships typed by
the predicate local name; literal-object triples become node
properties (first value wins deterministically — min literal per
(subj, pred), matching n10s single-value handle mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.iri import local_name_expr

NODES_HEADER = "uri:ID,label:string,:LABEL"
RELS_HEADER = ":START_ID,:END_ID,:TYPE,pred_iri:string"


def _csv_escape(col):
    return F.concat(
        F.lit('"'),
        F.regexp_replace(col.cast("string"), '"', '""'),
        F.lit('"'),
    )


def export_neo4j_admin_csv(
    kg_triples: DataFrame, out_dir: str
) -> tuple[str, str]:
    """kg_triples -> (nodes_dir, rels_dir) of admin-import CSV parts.

    Distributed: both outputs are plain ``df.write.text`` fan-outs (one
    part per task); the import command is emitted alongside. Returns
    the two directories.
    """
    rdfs_label = "http://www.w3.org/2000/01/rdf-schema#label"

    iri_objs = kg_triples.filter(~F.col("obj_is_literal"))
    entities = (
        kg_triples.select(F.col("subj").alias("uri"))
        .union(iri_objs.select(F.col("obj").alias("uri")))
        .distinct()
    )
    # deterministic display label: min rdfs:label literal, else local name
    labels = (
        kg_triples.filter(
            (F.col("pred") == rdfs_label) & F.col("obj_is_literal")
        )
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.min("obj").alias("label"))
    )
    nodes = (
        entities.join(labels, "uri", "left")
        .withColumn(
            "label", F.coalesce("label", local_name_expr(F.col("uri")))
        )
        .select(
            F.concat_ws(
                ",", _csv_escape(F.col("uri")), _csv_escape(F.col("label")),
                F.lit("Resource"),
            ).alias("value")
        )
    )
    # relationship type = predicate term name (text after the last / or
    # #; local_name_expr is the ontology-ID derivation, which strips
    # fragments — wrong here), uppercased, non-identifier chars -> _
    rel_type = F.upper(
        F.regexp_replace(
            F.regexp_extract(F.col("pred"), r"([^/#]+)$", 1),
            r"[^A-Za-z0-9_]", "_",
        )
    )
    rels = iri_objs.select(
        F.concat_ws(
            ",",
            _csv_escape(F.col("subj")),
            _csv_escape(F.col("obj")),
            _csv_escape(rel_type),
            _csv_escape(F.col("pred")),
        ).alias("value")
    ).distinct()

    nodes_dir = os.path.join(out_dir, "nodes")
    rels_dir = os.path.join(out_dir, "relationships")
    nodes.write.mode("overwrite").text(nodes_dir)
    rels.write.mode("overwrite").text(rels_dir)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "IMPORT.md"), "w") as f:
        f.write(
            "# Neo4j bulk load\n\n"
            "Option A — n10s RDF import (preserves full RDF semantics):\n"
            "```\nCALL n10s.graphconfig.init({handleVocabUris: 'KEEP'});\n"
            "CALL n10s.rdf.import.fetch('file:///<ntriples-part>', 'N-Triples');\n"
            "```\n(produce N-Triples with ontocast_spark.sources.ntriples."
            "write_ntriples)\n\n"
            "Option B — neo4j-admin import (offline bulk):\n"
            "```\nneo4j-admin database import full \\\n"
            f"  --nodes=Resource=\"{NODES_HEADER}\" + nodes/part-*.txt \\\n"
            f"  --relationships=\"{RELS_HEADER}\" + relationships/part-*.txt\n"
            "```\n"
            f"headers: nodes `{NODES_HEADER}`, rels `{RELS_HEADER}`\n"
        )
    return nodes_dir, rels_dir
