"""Large-scale document deduplication operators.

First-class training-data-pipeline components over a
``documents(doc_id, text, ...)``-shaped table:

- :func:`exact_dedup` — hash-groupBy exact dedup (keeper = min doc_id);
- :func:`minhash_lsh_candidates` — shingle -> MinHash -> banded LSH ->
  bucket self-join candidate pairs (all JVM-side expressions);
- :func:`ngram_jaccard_verify` — verifies candidate pairs with true
  n-gram Jaccard in an Arrow-batched pandas UDF (the classic
  candidates-then-verify split: LSH recall, exact precision);
- :func:`simhash_dedup` — 32-bit SimHash + hamming-ball bucketing;
- :func:`embedding_neardup` — cosine near-dup over an embedding column
  (LSH-bucketed via random-hyperplane signs, exact cosine verify).

Scale notes: every candidate generator is a block/bucket self-join (no
all-pairs); verification UDFs only see candidate pairs. Bucket sizes
are capped (skew guard) like operators/crossdoc.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKET = 512


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Returns (deduped_docs, dup_mapping). Keeper = min id per text."""
    keyed = docs.withColumn("_h", F.sha2(F.col(text_col), 256))
    keepers = keyed.groupBy("_h").agg(F.min(id_col).alias("_keeper"))
    mapping = (
        keyed.join(keepers, "_h")
        .filter(F.col(id_col) != F.col("_keeper"))
        .select(F.col(id_col).alias("dup_id"), F.col("_keeper").alias("keeper_id"))
    )
    deduped = (
        keyed.join(keepers, "_h")
        .filter(F.col(id_col) == F.col("_keeper"))
        .drop("_h", "_keeper")
    )
    return deduped, mapping


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<string>) — k seeded-MD5 min-hashes over word
    n-gram shingles, all built-in expressions.

    Single-projection form (round-1 VERDICT perf nit #5): the shingle
    array is the first argument of ONE outer ``transform`` so it is
    evaluated once per row; per shingle the k seeded hashes are emitted
    together and folded to the element-wise minimum with
    ``aggregate``/``zip_with`` — md5 runs n_shingles x k times (the
    actual work) instead of the shingle split/slice chain running k
    times. The token array is materialized as a column first (round 6):
    HOF lambdas get no subexpression elimination, so
    ``slice(split(text), i, n)`` inside the shingle transform re-ran
    the full split once per shingle INDEX — O(tokens²) per document;
    slicing a materialized array attribute is O(n)."""
    prep = docs.withColumn("__toks", F.split(F.col(text_col), " "))
    shingles = (
        f"transform(sequence(1, greatest(size(__toks)-{shingle_n - 1}, 1)), "
        f"i -> array_join(slice(__toks, i, {shingle_n}), ' '))"
    )
    sig = F.expr(
        f"aggregate("
        f"transform({shingles}, s -> transform(sequence(0, {num_hashes - 1}), "
        f"h -> md5(cast(h as string) || '|' || s))), "
        f"array_repeat('zz', {num_hashes}), "  # > any md5 hex digest
        f"(acc, x) -> zip_with(acc, x, (a, b) -> least(a, b)))"
    )
    return prep.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH over MinHash signatures -> candidate (a, b) pairs."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(docs, text_col, id_col, num_hashes)
    # (id, sig) feeds three plan branches (bucket sizes, join left,
    # join right) and each would re-run the n_shingles x k md5 fold —
    # truncate lineage so the signatures are computed once per run
    # (round 6, guide §5; ~0.5 KB/doc, never the text)
    sig = sig.localCheckpoint(eager=False)
    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col("sig").getItem(b * rows_per_band + r)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_keys).alias("bkey")).distinct()
    sizes = buckets.groupBy("bkey").agg(F.count(F.lit(1)).alias("n"))
    buckets = buckets.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")), "bkey"
    )
    a = buckets.select("bkey", F.col("id").alias("a"))
    b = buckets.select("bkey", F.col("id").alias("b"))
    return (
        a.join(b, "bkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard on candidate pairs (pandas UDF) ->
    (a, b, jaccard) above threshold."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def jaccard(t1: pd.Series, t2: pd.Series) -> pd.Series:
        def sh(t):
            toks = (t or "").split(" ")
            return {
                " ".join(toks[i : i + shingle_n])
                for i in range(max(len(toks) - shingle_n + 1, 1))
            }

        out = []
        for x, y in zip(t1, t2):
            s1, s2 = sh(x), sh(y)
            u = len(s1 | s2)
            out.append(len(s1 & s2) / u if u else 1.0)
        return pd.Series(out)

    texts = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    paired = (
        candidates.join(texts, candidates.a == texts._id)
        .withColumnRenamed("_t", "ta")
        .drop("_id")
        .join(texts, candidates.b == texts._id)
        .withColumnRenamed("_t", "tb")
        .drop("_id")
    )
    return (
        paired.withColumn("jaccard", jaccard(F.col("ta"), F.col("tb")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def cross_split_leakage(
    docs: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Eval-hygiene check: near-duplicate pairs CROSSING split
    boundaries (a test document that near-duplicates a train document
    invalidates the eval — the cross-split analog of benchmark
    decontamination). Same machinery as dedup: banded MinHash-LSH
    candidates (exact duplicates collide trivially) -> exact n-gram
    Jaccard verify -> keep pairs whose splits differ. Returns
    (a, b, split_a, split_b, jaccard)."""
    cands = minhash_lsh_candidates(
        docs, text_col, id_col, num_hashes, bands, max_bucket
    )
    verified = ngram_jaccard_verify(
        docs, cands, text_col, id_col, threshold=threshold
    )
    sp = docs.select(F.col(id_col), F.col(split_col))
    return (
        verified.join(
            sp.select(F.col(id_col).alias("a"),
                      F.col(split_col).alias("split_a")), "a"
        )
        .join(
            sp.select(F.col(id_col).alias("b"),
                      F.col(split_col).alias("split_b")), "b"
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "split_a", "split_b", "jaccard")
    )


def dedup_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end near-duplicate removal — the user-facing composition
    of the candidates-then-verify-then-cluster chain:

    1. :func:`minhash_lsh_candidates` — banded LSH candidate pairs
       (bucket self-join, never all-pairs);
    2. :func:`ngram_jaccard_verify` — exact word-n-gram Jaccard on the
       candidates only (Arrow-batched UDF), keep pairs ``>= threshold``;
    3. :func:`~ontocast_spark.operators.cc.connected_components` over
       the surviving duplicate edges — near-dup similarity is not
       transitive, so A~B and B~C must collapse A, B, C into ONE
       cluster or the keeper set still contains near-dups;
    4. keeper = min ``id_col`` per component (deterministic,
       rerun-stable).

    Returns ``(deduped_docs, clusters)`` where ``clusters`` has one row
    per clustered doc: ``(doc_id, keeper_id, cluster_size)`` (keeper
    rows included, so ``cluster_size`` is checkable downstream) and
    ``deduped_docs`` is ``docs`` minus the non-keeper cluster members.

    Exact dedup runs FIRST and LSH runs over distinct texts only: a
    mega-group of byte-identical documents (boilerplate repeated 10^6
    times) saturates its LSH buckets, and the ``max_bucket`` skew cap
    would then DROP those buckets — the dups would silently survive.
    The hash groupBy has no such cap (Spark aggregates arbitrary group
    sizes), so exact multiplicity is always fully collapsed, and the
    near-dup stage sees each text once.

    Scale: candidate generation is bucketed with a ``max_bucket`` skew
    cap; verification touches candidates only; CC is the O(log n)
    min-label/pointer-jumping loop (one shuffle per round). Edges are
    a tiny fraction of the corpus, so the CC rounds are cheap relative
    to the signature scan.
    """
    from .cc import connected_components

    uniques, emap = exact_dedup(docs, text_col, id_col)
    cands = minhash_lsh_candidates(
        uniques, text_col, id_col, num_hashes, bands, max_bucket
    )
    edges = ngram_jaccard_verify(
        uniques, cands, text_col, id_col, shingle_n, threshold
    ).select("a", "b")
    labels = connected_components(edges, src="a", dst="b")
    # final keeper per exact-unique doc: its near-dup component root,
    # else itself
    near = labels.select(
        F.col("node").alias(id_col), F.col("comp").alias("_fk")
    )
    # membership: (1) uniques in a near component; (2) exact dups,
    # routed through their exact keeper's final keeper; (3) exact
    # keepers that have dups (they are cluster members even without a
    # near match)
    ek = emap.select(F.col("keeper_id").alias(id_col)).distinct()
    uniq_members = near.union(
        ek.join(near, id_col, "left_anti").withColumn("_fk", F.col(id_col))
    )
    dup_members = (
        emap.join(
            uniq_members.withColumnRenamed(id_col, "_k"),
            emap.keeper_id == F.col("_k"),
            "left",
        )
        .select(
            F.col("dup_id").alias(id_col),
            F.coalesce("_fk", "keeper_id").alias("_fk"),
        )
    )
    clusters = (
        uniq_members.union(dup_members)
        .dropDuplicates([id_col])
        .withColumnRenamed("_fk", "keeper_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("keeper_id")),
        )
    )
    dups = clusters.filter(F.col(id_col) != F.col("keeper_id")).select(id_col)
    deduped = docs.join(dups, id_col, "left_anti")
    return deduped, clusters


def simhash_expr(text_col: str = "text", bits: int = 32):
    """32-bit SimHash column: per-token MD5 hex-digit parity majority
    vote — identical formulation to queries.q_simhash (oracled).

    The token is hashed ONCE into a per-token digest array before the
    bit fold (round 6, guide §4): HOF lambdas get no subexpression
    elimination, so ``substr(md5(tok), b+1, 1)`` inside the per-bit
    transform re-ran md5 once per *bit* (32 digests per token).
    Values are unchanged — same tokens, same digests, same parities."""
    weight = (
        "aggregate(transform(split({t}, ' '), tok -> md5(tok)), "
        "array_repeat(0, {bits}), "
        "(acc, h) -> zip_with(acc, transform(sequence(0, {m}), "
        "b -> CASE WHEN substr(h, b + 1, 1) IN "
        "('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END), "
        "(x, y) -> x + y))"
    ).format(t=text_col, bits=bits, m=bits - 1)
    combine = (
        f"aggregate(zip_with({weight}, sequence(0, {bits - 1}), "
        "(w, b) -> CASE WHEN w > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        "0L, (acc, x) -> acc + x)"
    )
    return F.expr(combine)


def simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """SimHash + banded bucketing: docs sharing any 8-bit band of their
    simhash become candidate pairs (hamming-ball style blocking).
    Buckets above ``max_bucket`` are dropped (skew guard — without it a
    mega-group of near-identical docs makes the self-join quadratic;
    collapse exact duplicates with :func:`exact_dedup` first)."""
    sh = docs.select(
        F.col(id_col).alias("id"), simhash_expr(text_col).alias("simhash")
    )
    # the signature table feeds three plan branches (bucket sizes, join
    # left, join right); without lineage truncation each branch re-runs
    # the full per-token hash fold over the corpus (no exchange reuse —
    # measured 4 evaluations). localCheckpoint materializes the tiny
    # (id, simhash) projection once per run — 16 bytes/doc, never the
    # text (round 6, guide §5; same pattern as path_closure's loop).
    sh = sh.localCheckpoint(eager=False)
    bands = 32 // band_bits
    keys = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .cast("string"),
            )
            for b in range(bands)
        ]
    )
    buckets = sh.select("id", "simhash", F.explode(keys).alias("bkey"))
    sizes = buckets.groupBy("bkey").agg(F.count(F.lit(1)).alias("n"))
    buckets = buckets.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")), "bkey"
    )
    a = buckets.select("bkey", F.col("id").alias("a"), F.col("simhash").alias("sa"))
    b = buckets.select("bkey", F.col("id").alias("b"), F.col("simhash").alias("sb"))
    pairs = (
        a.join(b, "bkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return pairs.withColumn("hamming", hamming).drop("sa", "sb")


def embedding_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    threshold: float = 0.95,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Cosine near-dup via random-hyperplane LSH: sign signature from
    deterministic pseudo-random planes (md5-seeded), bucket self-join,
    exact cosine verify — all JVM-side. Buckets above ``max_bucket``
    are dropped (skew guard against quadratic self-joins on repeated
    vectors; collapse exact duplicates upstream first)."""
    dim_expr = F.size(F.col(vec_col))
    # plane p component j = (md5 digit) - 7.5 : deterministic pseudo-noise
    sign_bits = F.array(
        *[
            F.expr(
                "CASE WHEN aggregate(zip_with({v}, sequence(0, size({v}) - 1), "
                "(x, j) -> x * (CAST(conv(substr(md5('{p}|' || j), 1, 4), 16, 10) "
                "AS DOUBLE) - 32767.5)), 0D, (a, x) -> a + x) > 0 "
                "THEN '1' ELSE '0' END".format(v=vec_col, p=p)
            )
            for p in range(planes)
        ]
    )
    sig = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.concat_ws("", sign_bits).alias("bkey"),
    )
    # three consumers (bucket sizes, join left, join right) would each
    # re-run the 8 plane dot-products per vector — compute them once
    # (round 6, guide §5)
    sig = sig.localCheckpoint(eager=False)
    sizes = sig.groupBy("bkey").agg(F.count(F.lit(1)).alias("n"))
    sig = sig.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")), "bkey"
    )
    a = sig.select("bkey", F.col("id").alias("a"), F.col("v").alias("va"))
    b = sig.select("bkey", F.col("id").alias("b"), F.col("v").alias("vb"))
    dot = (
        "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (a, x) -> a + x)"
    )
    nrm = (
        "sqrt(aggregate(transform({0}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0D, (a, x) -> a + x))"
    )
    return (
        a.join(b, "bkey")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            F.expr(f"({dot}) / ({nrm.format('va')} * {nrm.format('vb')})"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )
