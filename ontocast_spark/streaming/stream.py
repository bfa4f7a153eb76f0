"""Structured Streaming front-end: incremental KG construction.

The reference is strictly batch (no watermarks/state anywhere —
SURVEY.md §2.7); this module is the additional streaming surface a
transcript pipeline needs: conversations arrive as turn events, and the
KG store is maintained incrementally.

Design: ``readStream`` -> watermark on ``ts`` -> session-style
completion gate (a conversation is processed once its turns have been
quiet for ``quiet_for``) -> ``foreachBatch`` running the SAME batch
pipeline (``run_pipeline`` with a warehouse) per micro-batch. The batch
path's kg_canon resume key makes the sink idempotent: a conversation
re-delivered in a later micro-batch is anti-joined away, so
at-least-once delivery upstream still yields exactly-once KG rows.

``foreachBatch`` is the deliberate choice over a custom
``applyInPandasWithState`` operator: the whole batch pipeline (chunker,
extractor, canonicalizer) is reused unchanged, and state (which convs
are done) lives in the warehouse, not the state store — surviving
restarts with the stream checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ontology import OntologyIndex
from ..pipeline import PipelineConfig, run_pipeline


def stream_conversations_from_files(
    spark: SparkSession,
    input_path: str,
    schema,
    fmt: str = "parquet",
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source stream of turn events with an event-time watermark."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .load(input_path)
        .withWatermark("ts", watermark)
    )


def start_incremental_kg(
    stream: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    index: OntologyIndex | None = None,
    config: PipelineConfig | None = None,
    trigger_seconds: int = 30,
):
    """Start the incremental KG sink. Returns the StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # complete conversations present in this micro-batch; the
        # warehouse resume key drops already-finished ones
        run_pipeline(
            spark,
            batch_df,
            index=index,
            config=config,
            warehouse=warehouse,
            run_id=f"stream-batch-{batch_id}",
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def turn_rate_monitor(stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Windowed turn-rate aggregation (watermarked tumbling window) —
    the standard late-data-tolerant stream metric."""
    return (
        stream.groupBy(F.window("ts", window), F.col("role"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )
