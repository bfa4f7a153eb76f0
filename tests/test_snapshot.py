"""Frozen end-to-end snapshot: the full pipeline over three seeded
corpora must reproduce the committed triple-set hashes exactly
(P/R = 1.0 vs frozen fixtures). Guards the EXTRACTOR_VERSION contract:
any change to chunker/extractor/aggregation semantics shows up here and
must be an intentional fixture bump."""

import hashlib
import json
import os

from ontocast_spark.pipeline import run_pipeline
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.synth import gen_corpus

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_kg_snapshot.json")


def test_kg_snapshot_frozen(spark):
    expected = json.load(open(FIXTURE))
    for seed, exp in expected.items():
        conv = spark.createDataFrame(
            gen_corpus(8, seed=int(seed), mega_every=4, mega_turns=50),
            CONVERSATIONS,
        )
        kg = run_pipeline(spark, conv)["kg_triples"]
        rows = sorted(
            (r["conv_id"], r["subj"], r["pred"], r["obj"], str(r["obj_is_literal"]))
            for r in kg.collect()
        )
        h = hashlib.sha256(
            "\n".join("|".join(t) for t in rows).encode()
        ).hexdigest()
        assert len(rows) == exp["n_triples"], (seed, len(rows))
        assert h == exp["sha256"], (seed, "triple set drifted from frozen fixture")
