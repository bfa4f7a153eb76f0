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


def sample_mixture(
    df: DataFrame,
    weights_by_group: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture sampling: per group (e.g. per
    ``source``), keep the given fraction of rows — the pretraining
    data-mix operator (down-weight crawl, up-weight curated, drop the
    rest). Same salted-hash machinery as :func:`sample_deterministic`,
    so membership is rerun- and partition-invariant and each group's
    sample is independent of every other group's weight (a later remix
    of one source leaves the others' membership bit-identical). Groups
    not listed get ``default_weight``. Weights > 1 clamp to 1 (this is
    sampling without replacement; epoch-style repetition is a separate
    concern for the loader)."""
    bucket = hash_bucket(F.col(key_col), salt)
    threshold = None
    for g, w in sorted(weights_by_group.items()):
        t = int(round(min(max(w, 0.0), 1.0) * _BUCKETS))
        cond = F.col(group_col) == g
        threshold = (
            F.when(cond, t) if threshold is None else threshold.when(cond, t)
        )
    default_t = int(round(min(max(default_weight, 0.0), 1.0) * _BUCKETS))
    threshold = (
        F.lit(default_t) if threshold is None else threshold.otherwise(default_t)
    )
    return df.filter(bucket < threshold)


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
