"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline on sf0.001;
``queries``/``oracle_sql`` expose the operator inventory of SURVEY.md §2
plus the training-data-pipeline operators (dedup, MinHash/LSH, SimHash,
fingerprinting, quality scoring, ANN) with DuckDB oracles. Implemented
in :mod:`ontocast_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ontocast_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full transcript -> knowledge-graph pipeline
    (assemble -> chunk -> extract -> sublimate -> connect ->
    canonicalize) over transcript-shaped rows from sf0.001."""
    return QUERIES["q_kg_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
