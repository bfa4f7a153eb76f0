"""Fused per-document pass must produce exactly the same kg rows as the
staged operator chain."""

from pyspark.sql import functions as F

from ontocast_spark.pipeline import PipelineConfig, run_pipeline
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.synth import gen_corpus


def test_fused_equals_staged(spark):
    conv = spark.createDataFrame(
        gen_corpus(10, seed=11, mega_every=5, mega_turns=60), CONVERSATIONS
    )
    cols = ["conv_id", "subj", "pred", "obj", "obj_is_literal"]
    fused = run_pipeline(spark, conv, config=PipelineConfig(fused=True))
    staged = run_pipeline(spark, conv, config=PipelineConfig(fused=False))
    f = fused["kg_triples"].select(cols)
    s = staged["kg_triples"].select(cols)
    assert f.exceptAll(s).count() == 0
    assert s.exceptAll(f).count() == 0
    fm = fused["entity_mappings"].select("conv_id", "original_iri", "canonical_iri")
    sm = staged["entity_mappings"].select("conv_id", "original_iri", "canonical_iri")
    assert fm.exceptAll(sm).count() == 0
    assert sm.exceptAll(fm).count() == 0
    # ontology alignments agree as sets
    fo = fused["ontology_alignments"].select("subj", "pred", "obj")
    so = staged["ontology_alignments"].select("subj", "pred", "obj")
    assert fo.exceptAll(so).count() == 0
    assert so.exceptAll(fo).count() == 0
    # the fused plan has no post-assembly exchange (the canonicalize
    # shuffle is eliminated): exactly 2 exchanges in the whole plan
    plan = fused["kg_triples"]._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan