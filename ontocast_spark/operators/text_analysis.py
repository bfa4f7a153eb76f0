"""Text analysis operators for training-data pipelines (all JVM-side
column algebra unless noted): language ID, quality scoring, token
counting, document fingerprinting. Mirrors the oracled forms in
``ontocast_spark.queries`` as reusable operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny n-gram/stopword profiles for a heuristic language ID — enough to
# separate the major latin-script languages deterministically
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " los ", " de la ", " es ", " una "],
    "it": [" il ", " di ", " che ", " per ", " una "],
}

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def language_id_col(text: Column) -> Column:
    """Argmax of per-language marker hit counts; 'und' when nothing
    matches. Pure nested expressions — no UDF."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        score = None
        for m in markers:
            hits = (
                F.length(padded)
                - F.length(F.replace(padded, F.lit(m), F.lit("")))
            ) / len(m)
            score = hits if score is None else score + hits
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(
        F.lit("und")
    )


def token_count_col(text: Column, bpe_ish: bool = False) -> Column:
    """Whitespace token count, or a BPE-ish regex token count (letters /
    digits / single punctuation as separate tokens)."""
    if bpe_ish:
        # one regexp_count per row (letters-run | digits-run | single
        # symbol) instead of the replace+split+filter chain
        return F.regexp_count(text, F.lit(BPE_ISH_TOKEN_RE)).cast("long")
    return F.size(F.split(text, r"\s+")).cast("long")


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: lengths, token stats, punctuation and
    stopword ratios, uniq-token ratio — the usual pretraining-corpus
    filters."""
    t = F.col(text_col)
    tokens = F.split(t, r"\s+")
    stop_hits = F.size(
        F.filter(
            tokens,
            lambda x: F.lower(x).isin(
                "the", "a", "an", "and", "or", "of", "to", "in", "is", "it"
            ),
        )
    )
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return docs.select(
        "*",
        F.length(t).alias("q_n_chars"),
        token_count_col(t).alias("q_n_tokens"),
        F.round(
            F.size(F.array_distinct(tokens)).cast("double")
            / F.greatest(F.size(tokens), F.lit(1)).cast("double"),
            4,
        ).alias("q_uniq_ratio"),
        F.round(
            n_punct.cast("double")
            / F.greatest(F.length(t), F.lit(1)).cast("double"),
            4,
        ).alias("q_punct_ratio"),
        F.round(
            stop_hits.cast("double")
            / F.greatest(F.size(tokens), F.lit(1)).cast("double"),
            4,
        ).alias("q_stopword_ratio"),
        language_id_col(t).alias("q_lang"),
    )


def fingerprint_col(text: Column, gram: int = 8, stride: int = 8) -> Column:
    """Rolling-hash fingerprint: min MD5 over stride-``stride``
    ``gram``-grams (winnowing-lite; same formulation as the oracled
    q_doc_fingerprint)."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({'{c}'}) - {gram - 1}, 1), "
        f"{stride}), i -> md5(substring({'{c}'}, i, {gram}))))".format(c="__fp_text")
    )


def add_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("__fp_text", F.col(text_col)).withColumn(
        "fingerprint", fingerprint_col(F.col("__fp_text"))
    ).drop("__fp_text")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination: drop every corpus document sharing at
    least one word ``ngram``-gram with the benchmark set (the standard
    n-gram-overlap test-set-leakage guard for training corpora).

    Plan shape: explode both sides to (shingle, id), inner-join on the
    shingle, semi-join back — the benchmark side is tiny relative to
    the corpus, so its exploded shingle set broadcasts; the corpus is
    touched by one scan + one projection, never an all-pairs compare.

    Returns (clean_docs, contaminated(doc_id, n_hits))."""
    sh = (
        f"transform(sequence(1, greatest(size(split({text_col}, ' '))-{ngram - 1}, 1)), "
        f"i -> array_join(slice(split({text_col}, ' '), i, {ngram}), ' '))"
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("g")
    )
    bench_sh = (
        benchmark.select(F.explode(F.expr(sh)).alias("g")).distinct()
    )
    contaminated = (
        doc_sh.join(F.broadcast(bench_sh), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    clean = docs.join(contaminated.select(id_col), id_col, "left_anti")
    return clean, contaminated


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | list[str] | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign documents (in deterministic
    ``id_col`` order) to consecutive fixed-token-budget bins via a
    running token cumsum — the standard pretraining sample-packing
    layout, as a single window pass.

    ``seq_id = floor((cumsum - n_tokens) / budget)`` (bin by each doc's
    starting offset): every bin holds consecutive docs whose starts
    fall in one budget span. Oversized single documents occupy their
    own bins (and spill over; the downstream tokenizer truncates).
    Returns (doc_id, n_tokens, seq_id, offset_in_seq).

    Scale: pass ``shard_col`` (a column name or list of names) to pack
    independently within each shard — the cumsum window becomes
    ``partitionBy(*shards)`` and the sort stays distributed (the 100-TB
    form; ``seq_id`` is then per-shard). A single low-cardinality shard
    (e.g. a 90/5/5 ``split``) still funnels most rows through one
    window partition, so the composed corpus build passes
    ``[split, pack_shard]`` with a hashed sub-shard. The global form
    (``shard_col=None``) is a single total ordering and matches the
    DuckDB oracle exactly."""
    shards = (
        [shard_col] if isinstance(shard_col, str) else list(shard_col or [])
    )
    ntok = F.size(F.split(F.col(text_col), r"\s+"))
    w = (
        Window.partitionBy(*shards).orderBy(F.col(id_col))
        if shards
        else Window.orderBy(F.col(id_col))
    )
    cum = F.sum("n_tokens").over(w)
    keep = [id_col] + shards
    return (
        docs.select(*keep, ntok.cast("long").alias("n_tokens"))
        .withColumn("_end", cum)
        .withColumn("_start", F.col("_end") - F.col("n_tokens"))
        .select(
            *keep,
            "n_tokens",
            F.floor(F.col("_start") / budget_tokens).alias("seq_id"),
            (F.col("_start") % budget_tokens).alias("offset_in_seq"),
        )
    )
