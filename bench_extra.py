#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement; this file holds the guide-§1 isolation tooling).

Modes:
  --kg-stages        stage-isolated timing of the KG pipeline (synth
                     corpus identical to bench.py): assembly alone,
                     assembly+fused kernel, then the full bench-parity
                     kg_triples count. noop sink everywhere so we time
                     computation, not collection.
  --noop  Q [Q...]   per-query noop-sink timing at $SPARK_GRAFT_SF_DIR.
  --plans Q [Q...]   write .explain("formatted") for queries to
                     plans/<tag>/<q>_<suffix>.txt (--tag r06 --suffix
                     before|after).
  --all-queries      expand Q to every registered query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_KG_CONVS", "20000"))


def _spark(app="bench-extra"):
    from ontocast_spark.session import build_spark

    spark = build_spark(app_name=app, master=f"local[{CPUS}]",
                        shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(fn, runs=3):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    return min(samples), samples


def kg_stages(runs=3):
    from bench import _synth_conversations
    from ontocast_spark.operators.assemble import assemble_documents
    from ontocast_spark.operators.fused import kg_construct_fused
    from ontocast_spark.ontology import builtin_ontology_index
    from ontocast_spark.pipeline import PipelineConfig, run_pipeline

    spark = _spark("kg-stages")
    sc = spark.sparkContext
    conv = _synth_conversations(spark, N_CONVS).persist()
    n_turns = conv.count()
    index = builtin_ontology_index()
    cfg = PipelineConfig()

    out = {}

    sc.setJobDescription("kg: synth input only (noop)")
    out["synth_replay"] = _time(lambda: _noop(conv), runs)

    docs = assemble_documents(conv, domain=cfg.domain,
                              bucket_size=cfg.bucket_size,
                              max_turns=cfg.max_turns)
    sc.setJobDescription("kg: assembly (noop)")
    _noop(docs)  # warmup
    out["assembly"] = _time(lambda: _noop(docs), runs)

    fused = kg_construct_fused(spark, docs, index, max_chunks=cfg.max_chunks)
    sc.setJobDescription("kg: assembly+fused (noop)")
    _noop(fused)  # warmup
    out["assembly_fused"] = _time(lambda: _noop(fused), runs)

    def full():
        res = run_pipeline(spark, conv, config=cfg)
        res["kg_triples"].count()

    sc.setJobDescription("kg: full bench-parity count")
    full()  # warmup
    out["full_count"] = _time(full, runs)
    sc.setJobDescription(None)

    print(json.dumps({"n_turns": n_turns, "n_convs": N_CONVS,
                      "stages": {k: {"best": v[0], "samples": v[1]}
                                 for k, v in out.items()}}))
    conv.unpersist()
    spark.stop()


def noop_queries(names, runs=3):
    from ontocast_spark.queries import QUERIES

    spark = _spark("noop-queries")
    res = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"noop: {name}")
        _noop(df)  # warmup
        best, samples = _time(lambda: _noop(QUERIES[name](spark, SF_DIR)), runs)
        res[name] = {"best": best, "samples": samples}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "queries": res}))
    spark.stop()


def write_plans(names, tag, suffix):
    from ontocast_spark.queries import QUERIES

    spark = _spark("plans")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg-stages", action="store_true")
    ap.add_argument("--noop", nargs="*", default=None)
    ap.add_argument("--plans", nargs="*", default=None)
    ap.add_argument("--all-queries", action="store_true")
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    if args.kg_stages:
        kg_stages(args.runs)
        return
    names = args.noop if args.noop is not None else args.plans
    if args.all_queries:
        from ontocast_spark.queries import QUERIES

        names = list(QUERIES)
    if args.noop is not None:
        noop_queries(names, args.runs)
    elif args.plans is not None:
        write_plans(names, args.tag, args.suffix)


if __name__ == "__main__":
    main()
