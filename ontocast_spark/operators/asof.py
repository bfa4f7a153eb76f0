"""As-of join: each left row picks the most recent right row with
``right_ts <= left_ts`` per key — the standard event-stream enrichment
join (trades-to-quotes, purchases-to-views, metrics-to-deploys).

Spark has no native ASOF JOIN; the naive form is a non-equi join plus a
per-left-row argmax — quadratic in hot keys. This implements the
scalable canonical form instead, the **union + running-last trick**:

1. tag right rows 0 and left rows 1, union them (by name, missing
   columns null-filled);
2. one window ``partitionBy(key).orderBy(ts, tag)`` carries the last
   non-null right payload forward (``last(col, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, current)``) — right rows sort
   before left rows at equal timestamps, so ties match (>= semantics,
   same as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``);
3. keep only left rows.

Cost: ONE shuffle (the window partition) over left+right, linear work
per row, no join at all — at 100 TB this is the difference between a
runnable plan and a key-skew quadratic blowup. Skewed keys cost what
any keyed window costs; mega-keys can be range-split upstream because
the running-last is a prefix computation.

Determinism: ties inside (key, ts, tag) are broken by ``tiebreak``
columns (default: the right payload columns themselves), so results
hash-stably at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join. Returns every left row plus, per right payload
    column ``c``, a ``c{suffix}`` column holding the most recent right
    value at or before the left timestamp (NULL when none), and
    ``{right_ts}{suffix}`` with the matched right timestamp.

    ``tolerance_sec`` additionally nulls matches older than the given
    number of seconds (timestamps compare via their epoch seconds)."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = right_cols or [
        c for c in right.columns if c not in set(keys) | {right_ts}
    ]
    matched = {c: f"{c}{suffix}" for c in payload}
    ts_m = f"{right_ts}{suffix}"
    clash = ({ts_m, *matched.values(), "_ts", "_side", "_m"}
             & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output columns collide with left columns {clash}; "
            "pass a different suffix"
        )

    l2 = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(m) for c, m in matched.items()],
    ).withColumn("_side", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("_ts"), F.col("_side")] + [F.col(m) for m in matched.values()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry (ts + payload) as ONE struct so a right row whose payload
    # value is legitimately NULL still supersedes older rows — per-column
    # last(ignorenulls) would mix that row's ts with an older row's value
    row_struct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("__ts"),
            *[F.col(m).alias(m) for m in matched.values()],
        ),
    )
    u = u.withColumn("_m", F.last(row_struct, ignorenulls=True).over(w))
    u = u.withColumn(ts_m, F.col("_m.__ts"))
    for _, m in matched.items():
        u = u.withColumn(m, F.col(f"_m.{m}"))

    out = u.filter(F.col("_side") == 1).drop("_m")
    if tolerance_sec is not None:
        within = (
            F.col("_ts").cast("double") - F.col(ts_m).cast("double")
        ) <= F.lit(float(tolerance_sec))
        for m in [ts_m, *matched.values()]:
            out = out.withColumn(m, F.when(within, F.col(m)))
    return out.drop("_ts", "_side")
