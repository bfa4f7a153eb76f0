"""Structured Streaming front-end: file-source turn stream -> idempotent
incremental KG via foreachBatch over the batch pipeline."""

import os
import time

from pyspark.sql import functions as F

from ontocast_spark import io as kgio
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.streaming.stream import (
    start_incremental_kg,
    stream_conversations_from_files,
    turn_rate_monitor,
)
from ontocast_spark.synth import gen_corpus


def test_incremental_kg_stream(spark, tmp_path):
    in_dir = str(tmp_path / "turns")
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    rows = gen_corpus(6, seed=13, mega_every=0)
    half1 = [r for r in rows if r[0] < "conv00000003"]
    half2 = [r for r in rows if r[0] >= "conv00000003"]
    spark.createDataFrame(half1, CONVERSATIONS).write.mode("append").parquet(in_dir)

    stream = stream_conversations_from_files(spark, in_dir, CONVERSATIONS)
    q = start_incremental_kg(stream, warehouse, ckpt, trigger_seconds=1)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if kgio.stage_exists(spark, warehouse, "kg_canon"):
                done = {
                    r["conv_id"]
                    for r in kgio.read_stage(spark, warehouse, "kg_canon")
                    .select("conv_id").distinct().collect()
                }
                if len(done) >= 3:
                    break
            time.sleep(2)
        # second file arrives; plus a REPLAY of conv0 (at-least-once
        # delivery) — the kg_canon resume key must keep it exactly-once
        spark.createDataFrame(
            half2 + [r for r in rows if r[0] == "conv00000000"], CONVERSATIONS
        ).write.mode("append").parquet(in_dir)
        deadline = time.time() + 120
        while time.time() < deadline:
            done = {
                r["conv_id"]
                for r in kgio.read_stage(spark, warehouse, "kg_canon")
                .select("conv_id").distinct().collect()
            }
            if len(done) == 6:
                break
            time.sleep(2)
    finally:
        q.stop()

    canon = kgio.read_stage(spark, warehouse, "kg_canon")
    assert canon.select("conv_id").distinct().count() == 6
    dup = (
        canon.groupBy("conv_id", "row_kind", "subj", "pred", "obj")
        .count().filter(F.col("count") > 1).count()
    )
    assert dup == 0  # replayed conversation did not double-write


def test_turn_rate_monitor_plan(spark, tmp_path):
    in_dir = str(tmp_path / "turns2")
    spark.createDataFrame(
        gen_corpus(2, seed=1, mega_every=0), CONVERSATIONS
    ).write.mode("overwrite").parquet(in_dir)
    stream = stream_conversations_from_files(spark, in_dir, CONVERSATIONS)
    agg = turn_rate_monitor(stream)
    assert agg.isStreaming
    assert set(agg.columns) == {"window_start", "role", "n_turns"}
