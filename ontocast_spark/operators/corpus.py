"""End-to-end training-corpus build: the composed pipeline a
pretraining data team runs over raw documents.

One call chains the first-class operators in their canonical order —
each stage is the already-tested component, so this module is pure
composition plus the bookkeeping a real run needs (per-stage counts
via ``observe``-free aggregates, deterministic at any parallelism):

1. exact + near dedup (:func:`~ontocast_spark.operators.dedup.
   dedup_corpus` — exact-first, LSH over distinct texts, CC clusters);
2. benchmark decontamination (:func:`~ontocast_spark.operators.
   text_analysis.decontaminate` — word-8-gram overlap, broadcast
   benchmark side);
3. quality + language filtering (:func:`~ontocast_spark.operators.
   text_analysis.quality_features` thresholds — tune per corpus);
4. deterministic train/val/test split (:func:`~ontocast_spark.
   operators.dataset.assign_splits` — salted-hash, rerun-stable);
5. sequence packing (:func:`~ontocast_spark.operators.text_analysis.
   pack_sequences` — per-split sharded cumsum, distributed sort).

Every stage is a narrow projection/filter or an already-skew-guarded
join, so the composition inherits the scale properties of its parts;
nothing here adds a shuffle beyond the components' own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusBuildConfig:
    dedup_threshold: float = 0.9
    decontaminate_ngram: int = 8
    min_tokens: int = 5
    max_punct_ratio: float = 0.3
    min_uniq_ratio: float = 0.2
    languages: list[str] | None = None
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    split_salt: str = "corpus"
    pack_budget_tokens: int = 2048
    #: number of hashed packing sub-shards per split. The cumsum window
    #: partitions on (split, pack_shard): with a bare 90/5/5 ``split``
    #: shard ~90% of the corpus would sort in ONE window partition — a
    #: single-task global sort at 100 TB. Hash-sharding keeps every
    #: window partition ~corpus/n_pack_shards while preserving the
    #: layout contract (seq_id scoped per (split, pack_shard), bin and
    #: offset invariants hold within each shard).
    n_pack_shards: int = 64


def build_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CorpusBuildConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Returns ``{"corpus", "packing", "dropped"}``:

    - ``corpus`` — surviving docs with quality features, ``split``, and
      a ``drop_reason`` of NULL;
    - ``packing`` — (doc_id, split, n_tokens, seq_id, offset_in_seq)
      per-split packed layout for the train/val/test shards;
    - ``dropped`` — (doc_id, drop_reason) for every removed doc
      (``near_dup`` / ``contaminated`` / ``quality`` / ``language``),
      so corpus builds are auditable, not silent.
    """
    from .dataset import assign_splits
    from .dedup import dedup_corpus
    from .text_analysis import decontaminate, pack_sequences, quality_features

    cfg = config or CorpusBuildConfig()

    deduped, clusters = dedup_corpus(
        docs, text_col, id_col, threshold=cfg.dedup_threshold
    )
    dropped = (
        clusters.filter(F.col(id_col) != F.col("keeper_id"))
        .select(id_col, F.lit("near_dup").alias("drop_reason"))
    )

    if benchmark is not None:
        clean, contaminated = decontaminate(
            deduped, benchmark, text_col, id_col, cfg.decontaminate_ngram
        )
        dropped = dropped.unionByName(
            contaminated.select(
                id_col, F.lit("contaminated").alias("drop_reason")
            )
        )
    else:
        clean = deduped

    feats = quality_features(clean, text_col)
    quality_ok = (
        (F.col("q_n_tokens") >= cfg.min_tokens)
        & (F.col("q_punct_ratio") <= cfg.max_punct_ratio)
        & (F.col("q_uniq_ratio") >= cfg.min_uniq_ratio)
    )
    lang_ok = (
        F.col("q_lang").isin(cfg.languages) if cfg.languages else F.lit(True)
    )
    dropped = dropped.unionByName(
        feats.filter(~quality_ok).select(
            id_col, F.lit("quality").alias("drop_reason")
        )
    ).unionByName(
        feats.filter(quality_ok & ~lang_ok).select(
            id_col, F.lit("language").alias("drop_reason")
        )
    )
    kept = feats.filter(quality_ok & lang_ok)

    corpus = assign_splits(
        kept, id_col, weights=cfg.split_weights, salt=cfg.split_salt
    )
    sharded = corpus.withColumn(
        "pack_shard",
        F.pmod(F.xxhash64(F.col(id_col), F.lit("pack")), F.lit(cfg.n_pack_shards)),
    )
    packing = pack_sequences(
        sharded,
        cfg.pack_budget_tokens,
        text_col,
        id_col,
        shard_col=["split", "pack_shard"],
    )
    return {"corpus": corpus, "packing": packing, "dropped": dropped}
