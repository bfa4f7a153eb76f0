"""Mimics the driver's correctness gate: run every Spark query and its
DuckDB oracle on the same parquet tables, compare row count + sorted
value multiset. Runs at sf0.001 for speed (the driver uses sf0.01)."""

import math
import os

import duckdb
import pytest

from ontocast_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "\x00None"  # sortable sentinel distinct from any str value
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows_to_multiset(spark_cols, spark_rows)
    b = _rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diff = [x for x, y in zip(a, b) if x != y][:5]
        diffb = [y for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch\nspark={diff}\nduck ={diffb}")


def test_kg_pipeline_rows(spark):
    df = QUERIES["q_kg_pipeline"](spark, SF_DIR)
    assert df.count() > 0
