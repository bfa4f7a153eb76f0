"""Fused per-document KG construction: one ``mapInPandas`` pass from
assembled documents straight to canonical triples + mappings +
ontology-addendum rows.

Why this exists (the 100-TB argument): after document assembly, every
remaining stage of the reference's semantics — chunking, ontology
selection, extraction, sublimation, hub-connect, aggregation/
canonicalization — is *document-local* (the reference's disambiguation
scope is one document, /root/reference/ontocast/tool/aggregate.py:70-84).
A document is one row, so all of its intermediate data lives inside one
task. The staged operators (chunking.py / extraction.py /
canonicalize.py) materialize ~60 intermediate triple rows per
conversation through Arrow and shuffle them for the canonicalize
groupBy; this fused operator eliminates that entire exchange and all
intermediate Arrow crossings — the whole pipeline then has exactly the
two assembly exchanges, and per-row costs are dominated by the actual
extraction kernels (which scale with cores) instead of serialization.

The staged path remains for operator-level tests, diagnostics, and
warehouse materialization of intermediate tables; both paths produce
identical rows (tests/test_fused.py asserts set equality).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.aggregate import ChunkGraph, aggregate_chunks
from ..kernels.chunker import MAX_CHUNK_SIZE, MIN_CHUNK_SIZE, chunk_document
from ..kernels.extract import extract_chunk_triples
from ..kernels.graphs import connect_via_hub
from ..kernels.rdfterms import chunk_iri_for, iri2namespace, render_text_hash
from ..ontology import OntologyIndex
from .canonicalize import CANON_COMBINED_SCHEMA


def kg_construct_fused(
    spark: SparkSession,
    documents: DataFrame,
    index: OntologyIndex,
    max_chunks: int | None = None,
    min_chunk_size: int = MIN_CHUNK_SIZE,
    max_chunk_size: int = MAX_CHUNK_SIZE,
) -> DataFrame:
    """documents(conv_id, doc_iri, text) -> combined canon rows
    (row_kind: triple | entity_map | predicate_map | ontology)."""
    bc_index = spark.sparkContext.broadcast(index)
    cols = ("conv_id", "doc_iri", "row_kind", "subj", "pred", "obj",
            "obj_is_literal", "obj_datatype")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx: OntologyIndex = bc_index.value
        for pdf in batches:
            out = {k: [] for k in cols}

            def emit(conv_id, doc_iri, kind, rows):
                for s, p, o, lit, dt in rows:
                    out["conv_id"].append(conv_id)
                    out["doc_iri"].append(doc_iri)
                    out["row_kind"].append(kind)
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["obj_is_literal"].append(lit)
                    out["obj_datatype"].append(dt)

            for conv_id, doc_iri, text in zip(
                pdf["conv_id"], pdf["doc_iri"], pdf["text"]
            ):
                chunks = chunk_document(
                    text or "",
                    min_chunk_size=min_chunk_size,
                    max_chunk_size=max_chunk_size,
                )
                if max_chunks is not None:
                    chunks = chunks[:max_chunks]
                chunk_graphs: list[ChunkGraph] = []
                onto_rows: set[tuple] = set()
                for chunk_text in chunks:
                    hid = render_text_hash(chunk_text)
                    chunk_iri = chunk_iri_for(doc_iri, hid)
                    chunk_ns = iri2namespace(chunk_iri)
                    ontology_id = idx.select_ontology(chunk_text)
                    triples = extract_chunk_triples(
                        chunk_text, chunk_ns, idx, ontology_id
                    )
                    facts, onto = [], []
                    for t in triples:
                        s, p, o, lit, dt = t
                        in_cd = (
                            s.startswith(chunk_ns)
                            or p.startswith(chunk_ns)
                            or ((not lit) and o.startswith(chunk_ns))
                        )
                        (facts if in_cd else onto).append(t)
                    onto_rows.update(onto)
                    facts = sorted(connect_via_hub(facts, chunk_iri))
                    chunk_graphs.append(ChunkGraph(hid, chunk_iri, facts))
                agg, emap, pmap = aggregate_chunks(chunk_graphs, doc_iri)
                emit(conv_id, doc_iri, "triple", sorted(agg))
                emit(conv_id, doc_iri, "entity_map",
                     [(o, "", c, False, None) for o, c in emap.items()])
                emit(conv_id, doc_iri, "predicate_map",
                     [(o, "", c, False, None) for o, c in pmap.items()])
                emit(conv_id, doc_iri, "ontology", sorted(onto_rows))
            yield pd.DataFrame(out, columns=list(cols))

    return documents.select("conv_id", "doc_iri", "text").mapInPandas(
        process, schema=CANON_COMBINED_SCHEMA
    )
