"""Dataset assembly operators: deterministic splits and sampling.

A training-data pipeline needs rerun-stable corpus partitioning —
train/val/test assignment and down-sampling that (a) never shuffle,
(b) give every row the same fate on every run and every cluster size,
and (c) are joinable across tables (the same key always lands in the
same split).

Everything here is a salted-hash bucket: ``md5(salt | key)`` first 8
hex digits -> integer in [0, 2^32) -> proportional thresholds. All
JVM-side column algebra — a split assignment is a projection, a sample
is a filter, both fully pushdown-friendly (a parquet scan under a
sample filter still prunes columns; the filter itself is cheap
codegen, no shuffle, no RNG state).

Why not ``df.sample()``: Spark's sampler is seeded per-partition, so
the sampled *set* changes with partitioning and cluster size —
unacceptable for reproducible corpus builds. The salted hash is
partition-invariant by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000): first 8 hex digits of
    md5(salt|key) mod 10000 — identical formulation in the DuckDB
    oracles (('0x' || substr(md5(...), 1, 8))::BIGINT % 10000)."""
    h = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS)


def split_column(
    key: Column,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """CASE column assigning each key to a named split with the given
    proportions (must sum to ~1). Cumulative thresholds over the hash
    bucket, so enlarging one split keeps the others' membership stable
    only when appended at the end — document the salt + weights with
    the dataset."""
    total = sum(weights.values())
    bucket = hash_bucket(key, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        # round, not truncate: 0.3 * 10000 floats to 2999.999..., and
        # int() would shift the boundary one bucket off the documented
        # proportion (sample_deterministic already rounds)
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last)))


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column (default 90/5/5 train/val/test)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn("split", split_column(F.col(key_col), weights, salt))


def sample_deterministic(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Partition-invariant ``fraction`` sample: keeps rows whose hash
    bucket falls below ``fraction * 10000``. The same key survives (or
    not) on every run, any cluster size, any partitioning."""
    return df.filter(
        hash_bucket(F.col(key_col), salt) < int(round(fraction * _BUCKETS))
    )
