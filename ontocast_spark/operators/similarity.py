"""Similarity search over an embedding column (``array<float>``).

- :func:`brute_force_topk` — exact cosine top-k for a batch of query
  vectors: broadcast the queries, one pass over the corpus, per-query
  top-k via ``row_number`` partitioned by query (never a global sort).
- :func:`ivf_topk` — the scale path: k-means-lite inverted-file index.
  Centroids are sampled deterministically (md5-ordered sample), every
  vector is assigned to its nearest centroid (one narrow pass), and a
  query probes only ``nprobe`` nearest cells — corpus scan shrinks by
  ~ncells/nprobe. Assignments persist as a table, so index build is a
  one-off batch job and probing is a semi-join.

All vector math is JVM-side (``zip_with``/``aggregate`` in double
precision); no Python in the scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(aggregate(transform({0}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0D, (acc, x) -> acc + x))"
)


def _cosine_expr(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)}) / ({_NORM.format(a)} * {_NORM.format(b)})"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, sim, rank) — exact cosine top-k per query."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "sim", F.round(F.expr(_cosine_expr("cv", "qv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    ncells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids(cell_id, centroid), assignments(vec_id, cell_id)).

    Centroids = deterministic sample (first ``ncells`` ids by
    ``md5(id)`` order — seed-free, rerun-stable); assignment = argmax
    cosine vs broadcast centroids.
    """
    centroids = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("centroid"))
        .withColumn("_o", F.md5(F.col("cid").cast("string")))
        .orderBy("_o")
        .limit(ncells)
        .drop("_o")
        .withColumn(
            "cell_id",
            F.row_number().over(Window.orderBy("cid")).cast("int"),
        )
        .select("cell_id", "centroid")
    )
    scored = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("sim", F.expr(_cosine_expr("cv", "centroid")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell_id"))
    assignments = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )
    return centroids, assignments


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest cells per
    query; exact cosine within the probed subset."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qcells = q.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", F.expr(_cosine_expr("qv", "centroid"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell_id"))
    probe = (
        qcells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).join(assignments, "vec_id")
    scored = c.join(F.broadcast(probe), "cell_id").withColumn(
        "sim", F.round(F.expr(_cosine_expr("cv", "qv")), 6)
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )
