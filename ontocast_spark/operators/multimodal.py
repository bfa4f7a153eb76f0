"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The actual image/audio codecs are NOT in this container, so the decode
step is stubbed two ways (both clearly marked):

- ``decoder='strict'`` raises ``NotImplementedError`` (production would
  plug Pillow/torchaudio here);
- ``decoder='fake'`` (default, used by tests) derives a deterministic
  fake feature vector from the payload bytes — the Spark-side plumbing
  (schema, batch shape, partitioning, UDF signature) is real and
  tested; only the codec is substituted.

Schema convention::

    media(media_id string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", IntegerType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])

FEATURE_DIM = 32


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature: sha256-seeded byte histogram.
    STUB — replaces the real image/audio decode (libs unavailable)."""
    if payload is None:
        payload = b""
    h = hashlib.sha256(payload).digest()
    base = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (base % 1000).astype(np.float32) / 1000.0


def extract_media_features(
    media: DataFrame, decoder: str = "fake", batch_limit: int = 256
) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature) via mapInPandas.

    ``batch_limit`` re-chunks Arrow batches so a batch of large blobs
    cannot blow executor memory (binary columns dominate batch size).
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                part = pdf.iloc[start : start + batch_limit]
                feats, nbytes = [], []
                for payload in part["payload"]:
                    raw = bytes(payload) if payload is not None else b""
                    nbytes.append(len(raw))
                    if decoder == "fake":
                        feats.append(_fake_decode(raw).tolist())
                    else:
                        raise NotImplementedError(
                            "real media decode requires image/audio libs "
                            "not present in this environment; plug a codec "
                            "here (Pillow/torchaudio) and keep the same "
                            "batch contract"
                        )
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"].tolist(),
                        "kind": part["kind"].tolist(),
                        "n_bytes": nbytes,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "kind", "payload").mapInPandas(
        feature_batches, schema=MEDIA_FEATURES
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-sampling plan for video rows: which frame
    indices to decode (metadata-only; decode itself is the stub above).
    Pure column algebra — no UDF."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.expr(
            f"sequence(0, greatest(coalesce(meta.n_frames, 1) - 1, 0), {every_n})"
        ).alias("frame_indices"),
    )


RESIZED_MEDIA = StructType([
    StructField("media_id", StringType(), True),
    StructField("kind", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("payload", BinaryType(), True),
])


def resize_media(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    batch_limit: int = 64,
) -> DataFrame:
    """Resize plumbing for image rows: the Spark side (schema, Arrow
    batch re-chunking so large blobs never blow a batch, metadata
    columns) is real; the pixel transform itself is the same honest
    codec boundary as :func:`extract_media_features` — a deterministic
    truncate-or-pad fake stands in for Pillow's resample, preserving
    the exact batch contract a real codec plugs into."""

    target = width * height // 64  # fake payload budget, deterministic

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                part = pdf.iloc[start : start + batch_limit]
                out = []
                for payload in part["payload"]:
                    raw = bytes(payload) if payload is not None else b""
                    # STUB: real codec = decode -> resample(width, height)
                    # -> re-encode; fake keeps determinism + size shape
                    resized = (raw * (target // max(len(raw), 1) + 1))[:target]
                    out.append(resized)
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"].tolist(),
                        "kind": part["kind"].tolist(),
                        "width": [width] * len(part),
                        "height": [height] * len(part),
                        "payload": out,
                    }
                )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(resize_batches, schema=RESIZED_MEDIA)
    )
