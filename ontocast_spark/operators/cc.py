"""Distributed connected components over candidate-match edges.

The reference finds components with per-chunk BFS
(/root/reference/ontocast/tool/validate.py:125-155) and greedy O(n^2)
entity grouping (/root/reference/ontocast/tool/aggregate.py:505-559) —
both single-process. This is the corpus-scale replacement the north
rule names: iterative min-label propagation implemented as self-joins
(the join-based form of the large-star/small-star family — converges in
O(log n) rounds on the star-shaped merge graphs entity resolution
produces, and each round is one shuffle).

Scale notes:
- ``localCheckpoint`` after every round truncates the join lineage
  (otherwise plan depth grows linearly and re-optimizes each round);
- convergence is detected with a changed-label count (an AQE-coalesced
  aggregate over the label table, not a collect);
- labels are the lexicographic MIN member IRI, so component ids are
  deterministic and rerun-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> labels(node, comp) with comp = min IRI of the
    component. Nodes appearing only as isolated vertices should be
    unioned in by the caller as self-loops (src == dst)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # (1) neighbor-min: pull the smallest label from direct neighbors
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "comp")
        )
        new_labels = (
            nbr_min.union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # (2) pointer jumping: comp <- comp's own comp (path halving) —
        # turns O(diameter) rounds into O(log n)
        jump = new_labels.select(
            F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
        )
        new_labels = (
            new_labels.join(jump, new_labels.comp == jump.jnode, "left")
            .select(
                "node", F.coalesce("jcomp", "comp").alias("comp")
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
