"""Table I/O + per-partition lineage checkpointing.

Production target is Iceberg (``df.writeTo(table).append()``); this
sandbox has no catalog, so the writer falls back to partitioned Parquet
under a warehouse directory — both paths share this module, mirroring
the reference's pluggable triple-store managers
(/root/reference/ontocast/toolbox.py:98-117: Fuseki > Neo4j >
filesystem).

Resumability contract (north rule): every stage write also records a
``checkpoints`` table row per task partition (stage, partition_id,
row_count, conv_count, run_id) — the Spark analog of the reference's
AgentState JSON checkpoint (/root/reference/ontocast/onto.py:112-136).
A killed job resumes by anti-joining the input's ``conv_id`` against
the completed stage output (:func:`resume_filter`) — no recompute of
finished conversations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _use_iceberg(spark: SparkSession) -> bool:
    return spark.conf.get("spark.sql.catalog.kg", None) is not None


def write_stage(
    df: DataFrame,
    warehouse: str,
    stage: str,
    run_id: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> str:
    """Write a stage table + its checkpoint rows. Returns the path."""
    spark = df.sparkSession
    path = os.path.join(warehouse, stage)
    if _use_iceberg(spark):
        from pyspark.sql import functions as F_  # local alias

        writer = df.writeTo(f"kg.{stage}")
        if mode == "overwrite":
            # bucket the store by conv_id so per-conversation reads and
            # the resume anti-join are partition-pruned at cluster scale
            if "conv_id" in df.columns:
                writer = writer.partitionedBy(F_.bucket(64, F_.col("conv_id")))
            writer.createOrReplace()
        else:
            writer.append()
    else:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    # lineage: per-partition counters over the *written* data (cheap:
    # parquet footer counts + one small agg)
    written = read_stage(spark, warehouse, stage)
    agg = [F.count(F.lit(1)).alias("row_count")]
    if "conv_id" in written.columns:
        agg.append(F.approx_count_distinct("conv_id").alias("conv_count"))
    else:
        agg.append(F.lit(None).cast("long").alias("conv_count"))
    ckpt = (
        written.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(*agg)
        .select(
            F.lit(stage).alias("stage"),
            "partition_id",
            "row_count",
            "conv_count",
            F.lit(run_id).alias("run_id"),
        )
    )
    ckpt_path = os.path.join(warehouse, "checkpoints")
    ckpt.write.mode("append").parquet(ckpt_path)
    return path


def read_stage(spark: SparkSession, warehouse: str, stage: str) -> DataFrame:
    if _use_iceberg(spark):
        return spark.read.table(f"kg.{stage}")
    return spark.read.parquet(os.path.join(warehouse, stage))


def stage_exists(spark: SparkSession, warehouse: str, stage: str) -> bool:
    path = os.path.join(warehouse, stage)
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def resume_filter(
    inputs: DataFrame, spark: SparkSession, warehouse: str, stage: str
) -> DataFrame:
    """Drop conversations already present in a completed stage output —
    the anti-join resume path. No-op if the stage doesn't exist yet."""
    if not stage_exists(spark, warehouse, stage):
        return inputs
    done = read_stage(spark, warehouse, stage).select("conv_id").distinct()
    return inputs.join(done, on="conv_id", how="left_anti")
