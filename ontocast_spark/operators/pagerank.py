"""PageRank over KG entity edges — the standard entity-importance
score for a constructed knowledge graph (which canonical entities are
load-bearing; feeds entity ranking, sampling weights, and QA triage).

Simple (non-dangling-redistributing) PageRank:

    r_0(v)     = 1 / N
    r_{k+1}(v) = (1 - d) / N + d * sum_{(u, v) in E} r_k(u) / outdeg(u)

Dangling mass is NOT redistributed (documented choice — it keeps every
iteration a pure join + aggregate and the DuckDB oracle an exact
unrolled-CTE mirror; the normalized variant is one extra scalar
aggregate per round if a consumer needs rank sums of exactly 1).

Scale: each iteration is one hash join (edges x ranks, key = src) and
one aggregation (contributions by dst) — two shuffles per round over
edge-proportional data, the same shape GraphX/Pregel executes.
``localCheckpoint`` after each round truncates the lineage exactly like
operators/cc.py's label loop (without it plan depth grows linearly and
re-optimizes each action). The one driver-side scalar is N (a single
count — unavoidable: it parameterizes the teleport term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """edges(src, dst) -> (node, rank) after ``iterations`` rounds.
    Deterministic: no randomness, float sums over per-node contribution
    groups (small fan-in) — rerun- and partitioning-stable to well
    below 1e-9."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # pre-divide once: contribution weight per edge endpoint
    weighted = (
        e.join(outdeg, "u")
        .select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint()
    )
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            weighted.join(ranks, weighted.u == ranks.node)
            .groupBy("v")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.v, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
