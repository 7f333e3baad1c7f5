"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schema, Arrow batching via mapInPandas, partition
sizing) is real and tested; the codec step is STUBBED because this container
has no image/audio libraries. Swap `decoder=` for a real implementation
(PIL/ffmpeg) in production — the UDF signature and batch shape don't change.

Design notes for 100 TB:
  * binary payloads dominate partition size — media tables should be written
    with small files.maxPartitionBytes and the metadata projected out before
    any join (column pruning keeps the scan from dragging bytes through
    shuffles)
  * feature extraction is mapInPandas (iterator form) so one Python worker
    streams Arrow batches without materializing a partition
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def real_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Real codec entry point — NOT AVAILABLE in this container (no PIL /
    ffmpeg). Production swaps this in for `fake_decode`."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_decode (deterministic) or install codecs"
    )


def fake_decode(payload: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: sha256 of the payload expanded into a
    float vector in [0,1). Keeps every downstream shape/test real."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw / np.float32(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                int(rng.integers(16, 4096)) if mt == "image" else None,
                int(rng.integers(16, 4096)) if mt == "image" else None,
                int(rng.integers(1000, 600000)) if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
