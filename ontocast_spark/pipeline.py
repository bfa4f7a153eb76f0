"""End-to-end KG-construction pipeline (the Spark form of the
reference's whole langgraph state machine,
/root/reference/ontocast/stategraph/create.py:24-146).

Stage graph (each stage is set-oriented over the whole corpus — the
reference's per-document/per-chunk loops disappear)::

    conversations ──assemble──▶ documents ──chunk──▶ chunks
        ──extract(+select,+sublimate,+connect fused)──▶ triples{facts,ontology}
        facts ──canonicalize(groupBy conv_id)──▶ kg_triples
        ontology ──dedup──▶ ontology_alignments

Shuffle budget (what actually moves at 100 TB):
- fused path (default, round 6): ONE hash repartition of the raw turns
  on conv_id — assembly, chunking, extraction, sublimation, connection
  and canonicalization all run inside the single downstream
  ``mapInPandas`` task (operators/fused.kg_construct_fused_turns);
- staged path (diagnostic): the two-level assembly groupBy (bounded
  buffers) plus the canonicalize groupBy(conv_id).
The ontology-addendum dedup is a small distinct over ontology-namespace
rows (term declarations repeat per chunk — high map-side combine
ratio).

``run_pipeline`` optionally persists every stage through
:mod:`ontocast_spark.io` (parquet/Iceberg + per-partition lineage
checkpoints) and resumes by anti-join when re-invoked with the same
warehouse (north-rule resumability).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io as kgio
from .ontology import OntologyIndex, builtin_ontology_index
from .schemas import split_lang_columns
from .operators.assemble import assemble_documents
from .operators.canonicalize import canonicalize_combined
from .operators.chunking import chunk_documents
from .operators.extraction import extract_triples


@dataclass
class PipelineConfig:
    domain: str = "https://example.com"
    max_turns: int | None = 100_000  # mega-conversation cap (skew guard)
    max_chunks: int | None = None  # reference AgentState.max_chunks analog
    bucket_size: int = 1024
    # fused per-document pass (operators/fused.py): identical rows to the
    # staged path, but no canonicalize shuffle and no intermediate Arrow
    # crossings — the production default. Staged mode materializes the
    # per-chunk triples table as a diagnostic.
    fused: bool = True


def dedup_ontology_addendum(onto: DataFrame) -> DataFrame:
    """Ontology-addendum rows repeat per chunk; collapse to the distinct
    term-declaration graph (the reference merges addenda into the
    managed ontology by graph-union set semantics,
    /root/reference/ontocast/tool/ontology_manager.py:36-46)."""
    return (
        onto.select("subj", "pred", "obj", "obj_is_literal", "obj_datatype")
        .dropDuplicates(["subj", "pred", "obj"])
    )


def run_pipeline(
    spark: SparkSession,
    conversations: DataFrame,
    index: OntologyIndex | None = None,
    config: PipelineConfig | None = None,
    warehouse: str | None = None,
    run_id: str = "run0",
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns the stage DataFrames. When
    ``warehouse`` is set, stages are persisted with lineage checkpoints
    and already-completed conversations are skipped on re-run."""
    index = index or builtin_ontology_index()
    cfg = config or PipelineConfig()

    if warehouse is not None:
        # kg_canon is the incremental store and the resume key: a
        # conversation present there is done and is never recomputed.
        conversations = kgio.resume_filter(
            conversations, spark, warehouse, "kg_canon"
        )

    # lazily-built documents table (returned to callers / staged path);
    # the fused path does NOT consume it — assembly is fused into the
    # kernel pass (one exchange; see operators/fused.py), so this
    # DataFrame is only evaluated when a consumer actually runs it
    documents = assemble_documents(
        conversations,
        domain=cfg.domain,
        bucket_size=cfg.bucket_size,
        max_turns=cfg.max_turns,
        single_exchange=True,  # every in-pipeline consumer materializes text
    )

    facts = None
    chunks = None
    if cfg.fused:
        from .operators.fused import kg_construct_fused_turns

        combined = kg_construct_fused_turns(
            spark, conversations, index, domain=cfg.domain,
            max_turns=cfg.max_turns, max_chunks=cfg.max_chunks,
        )
        ontology_rows = combined.filter(F.col("row_kind") == "ontology").drop(
            "row_kind"
        )
        if warehouse is not None:
            mode = (
                "append"
                if kgio.stage_exists(spark, warehouse, "kg_canon")
                else "overwrite"
            )
            # partition by row_kind: downstream row_kind filters become
            # partition pruning instead of data scans
            kgio.write_stage(
                combined, warehouse, "kg_canon", run_id, mode=mode,
                partition_by=("row_kind",),
            )
            combined = kgio.read_stage(spark, warehouse, "kg_canon")
            ontology_rows = combined.filter(
                F.col("row_kind") == "ontology"
            ).drop("row_kind")
    else:
        chunks = chunk_documents(documents, max_chunks=cfg.max_chunks)
        triples = extract_triples(spark, chunks, index, fuse=True)

        if warehouse is not None:
            # materialize extraction once (it feeds three outputs) — no
            # pandas-UDF re-execution for downstream projections
            mode = (
                "append"
                if kgio.stage_exists(spark, warehouse, "triples")
                else "overwrite"
            )
            kgio.write_stage(triples, warehouse, "triples", run_id, mode=mode)
            triples = kgio.read_stage(spark, warehouse, "triples")
            # the triples table may hold conversations finished in a
            # prior run; only canonicalize the pending ones
            pending = kgio.resume_filter(triples, spark, warehouse, "kg_canon")
        else:
            pending = triples

        facts = pending.filter(F.col("part") == "facts").drop("part")
        ontology_rows = triples.filter(F.col("part") == "ontology").drop("part")

        combined = canonicalize_combined(facts)
        if warehouse is not None:
            mode = (
                "append"
                if kgio.stage_exists(spark, warehouse, "kg_canon")
                else "overwrite"
            )
            kgio.write_stage(combined, warehouse, "kg_canon", run_id, mode=mode)
            combined = kgio.read_stage(spark, warehouse, "kg_canon")

    kg_triples = split_lang_columns(
        combined.filter(F.col("row_kind") == "triple").select(
            "conv_id", "doc_iri", "subj", "pred", "obj",
            "obj_is_literal", "obj_datatype",
        )
    )
    mappings = combined.filter(
        F.col("row_kind").isin("entity_map", "predicate_map")
    ).select(
        "conv_id",
        F.col("subj").alias("original_iri"),
        F.col("obj").alias("canonical_iri"),
        F.when(F.col("row_kind") == "entity_map", F.lit("entity"))
        .otherwise(F.lit("predicate"))
        .alias("kind"),
    )
    alignments = split_lang_columns(dedup_ontology_addendum(ontology_rows))

    out = {
        "documents": documents,
        "kg_triples": kg_triples,
        "entity_mappings": mappings,
        "ontology_alignments": alignments,
    }
    if chunks is not None:
        out["chunks"] = chunks
    if facts is not None:
        out["facts"] = facts
    if warehouse is not None:
        # projections of the complete kg_canon store: cheap
        # parquet-to-parquet rewrites, refreshed whole
        kgio.write_stage(kg_triples, warehouse, "kg_triples", run_id, mode="overwrite")
        kgio.write_stage(
            alignments, warehouse, "ontology_alignments", run_id, mode="overwrite"
        )
        out["kg_triples"] = kgio.read_stage(spark, warehouse, "kg_triples")
    return out


def run_pipeline_documents(
    spark: SparkSession,
    documents: DataFrame,
    index: OntologyIndex | None = None,
    config: PipelineConfig | None = None,
    warehouse: str | None = None,
    run_id: str = "run0",
    id_col: str = "doc_path",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Document-direct entry (the reference's one-file-one-document
    mode, fed by ``sources.documents.read_documents_dir``): each row is
    one whole document. Implemented as single-turn conversations through
    :func:`run_pipeline` — assembly of a one-turn conversation is
    byte-identical to the document, so ``doc_hid = sha256(text)[:12]``
    matches the reference's file hashing exactly
    (/root/reference/ontocast/onto.py:986-993) and every downstream
    stage, checkpoint, and resume contract is shared with the
    transcript path."""
    conversations = documents.select(
        F.col(id_col).cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("document").alias("role"),
        F.col(text_col).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    return run_pipeline(
        spark, conversations, index=index, config=config,
        warehouse=warehouse, run_id=run_id,
    )
