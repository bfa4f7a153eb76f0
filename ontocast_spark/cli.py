"""spark-submit entry point.

Usage (cluster)::

    zip -r pipeline.zip ontocast_spark
    spark-submit --py-files pipeline.zip -m ontocast_spark.cli \
        --input /path/to/conversations_parquet_or_iceberg_table \
        --warehouse /path/to/kg_warehouse \
        [--ontology-dir /path/to/ttl_dir] [--domain https://example.com] \
        [--ttl-out /path/to/facts_ttl_dir]

Reads the transcript table (Iceberg table name or parquet path), runs
the full pipeline with warehouse checkpointing (resumable — re-running
the same command after a kill skips finished conversations), and
optionally serializes per-conversation Turtle facts files.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="ontocast_spark KG pipeline")
    ap.add_argument("--input", required=True,
                    help="parquet path or Iceberg table of conversations")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--ontology-dir", default=None)
    ap.add_argument("--domain", default="https://example.com")
    ap.add_argument("--ttl-out", default=None)
    ap.add_argument("--max-turns", type=int, default=100_000)
    ap.add_argument("--max-chunks", type=int, default=None)
    ap.add_argument("--run-id", default="cli")
    args = ap.parse_args(argv)

    from .ontology import builtin_ontology_index
    from .pipeline import PipelineConfig, run_pipeline
    from .sources.documents import load_ontology_dir, write_facts_turtle

    spark = SparkSession.builder.appName("ontocast-spark").getOrCreate()
    if "/" in args.input or args.input.endswith(".parquet"):
        conversations = spark.read.parquet(args.input)
    else:
        conversations = spark.read.table(args.input)

    index = (
        load_ontology_dir(args.ontology_dir)
        if args.ontology_dir
        else builtin_ontology_index()
    )
    out = run_pipeline(
        spark,
        conversations,
        index=index,
        config=PipelineConfig(
            domain=args.domain,
            max_turns=args.max_turns,
            max_chunks=args.max_chunks,
        ),
        warehouse=args.warehouse,
        run_id=args.run_id,
    )
    n = out["kg_triples"].count()
    print(f"kg_triples rows: {n}")
    if args.ttl_out:
        written = write_facts_turtle(out["kg_triples"], args.ttl_out)
        print(f"turtle files written: {written}")


if __name__ == "__main__":
    main()
