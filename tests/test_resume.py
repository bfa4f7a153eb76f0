"""Checkpoint/resume: a second run over a superset input must only
process the new conversations and produce the same final store as a
single full run (north-rule resumability)."""

import os

from pyspark.sql import functions as F

from ontocast_spark import io as kgio
from ontocast_spark.pipeline import run_pipeline
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.synth import gen_corpus


def test_resume_no_recompute(spark, tmp_path):
    warehouse = os.path.join(str(tmp_path), "wh")
    rows = gen_corpus(8, seed=42, mega_every=0)
    full = spark.createDataFrame(rows, schema=CONVERSATIONS)
    first_half = full.filter(F.col("conv_id") < "conv00000004")

    run_pipeline(spark, first_half, warehouse=warehouse, run_id="r1")
    canon1 = kgio.read_stage(spark, warehouse, "kg_canon")
    convs1 = {r["conv_id"] for r in canon1.select("conv_id").distinct().collect()}
    assert convs1 == {f"conv{i:08d}" for i in range(4)}

    # resume with the full input: only conv 4..7 get computed/appended
    run_pipeline(spark, full, warehouse=warehouse, run_id="r2")
    canon2 = kgio.read_stage(spark, warehouse, "kg_canon")
    convs2 = {r["conv_id"] for r in canon2.select("conv_id").distinct().collect()}
    assert convs2 == {f"conv{i:08d}" for i in range(8)}

    # no duplicates from the append (each conv appears exactly once)
    dup = (
        canon2.groupBy("conv_id", "row_kind", "subj", "pred", "obj")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0

    # fresh single-shot run equals the resumed store
    warehouse2 = os.path.join(str(tmp_path), "wh2")
    run_pipeline(spark, full, warehouse=warehouse2, run_id="r0")
    canon_ref = kgio.read_stage(spark, warehouse2, "kg_canon")
    cols = ["conv_id", "row_kind", "subj", "pred", "obj"]
    assert canon2.select(cols).exceptAll(canon_ref.select(cols)).count() == 0
    assert canon_ref.select(cols).exceptAll(canon2.select(cols)).count() == 0

    # lineage checkpoints exist for every persisted stage
    ckpt = spark.read.parquet(os.path.join(warehouse, "checkpoints"))
    stages = {r["stage"] for r in ckpt.select("stage").distinct().collect()}
    assert {"kg_canon", "kg_triples"} <= stages
