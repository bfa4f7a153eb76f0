"""Deterministic cardinality sketching: the K-minimum-values (KMV)
estimator (Bar-Yossef et al. 2002 / Beyer et al. 2007).

Why KMV and not HLL here: Spark's ``approx_count_distinct`` is an
HLL++ whose register layout no other engine reproduces, so it can
never be value-checked cross-engine. KMV is just "the k smallest
hash values": estimate = (k - 1) / h_k where ``h_k`` is the k-th
smallest hash mapped into [0, 1). With an md5-based hash both Spark
and DuckDB compute the IDENTICAL estimate bit-for-bit — an oracled
sketch. It is also mergeable (union the k-min sets, keep the k
smallest) — the property that makes sketches usable at 100 TB:
per-partition partial sketches combine associatively.

Plan shape: hash -> per-group window rank (ROW_NUMBER over the hash
order) -> keep rank <= k -> one aggregate per group. The window
shuffles once on the group key; the rank <= k filter bounds state at
k rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = float(1 << 32)


def kmv_hash(col) -> "F.Column":
    """Value -> deterministic hash in [0, 1): first 8 md5 hex digits /
    2^32 — the same formulation the DuckDB oracle runs
    (('0x' || substr(md5(v), 1, 8))::BIGINT / 4294967296.0)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(_HASH_SPACE)
    )


def kmv_sample_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-group quantile estimates from a DETERMINISTIC k-min-hash row
    sample — the cross-engine-checkable alternative to
    ``approx_percentile`` (whose GK/KLL internals no other engine
    reproduces, same argument as KMV vs HLL).

    The k rows with the smallest ``md5(id)`` hashes form a uniform
    without-replacement sample of the group (hashing a UNIQUE row id —
    hashing the value would bias toward distinct values); exact
    interpolated percentiles over that sample estimate the group
    quantiles with the usual order-statistic error ~ 1/sqrt(k). The
    min-k-by-hash sample is mergeable (union, keep k smallest), so
    per-partition partials combine associatively at 100 TB; groups
    with <= k rows are sampled exactly (the estimate is then exact).
    Plan shape: one window shuffle on the group key, state bounded at
    k rows per group, then one aggregate."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        kmv_hash(F.col(id_col)).alias("h"),
    )
    w = Window.partitionBy("g").orderBy("h", "v")
    sampled = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    aggs = [
        F.round(F.percentile("v", F.lit(q)), 6).alias(f"p{round(q * 100)}")
        for q in quantiles
    ]
    return sampled.groupBy("g").agg(
        F.count(F.lit(1)).alias("sample_n"), *aggs
    ).withColumnRenamed("g", group_col)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``:
    (group, n_seen, est_distinct). Exact when a group has fewer than
    ``k`` distinct values (the sketch holds them all); otherwise the
    (k-1)/h_k estimator with relative error ~ 1/sqrt(k-2)."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        kmv_hash(F.col(value_col)).alias("h"),
    ).dropDuplicates(["g", "h"])
    w = Window.partitionBy("g").orderBy("h")
    ranked = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    return (
        ranked.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("hk"),
        )
        .select(
            F.col("g").alias(group_col),
            # fewer than k distinct hashes -> the sketch IS the set
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise((F.lit(float(k - 1))) / F.col("hk"))
            .alias("est_distinct"),
        )
    )
