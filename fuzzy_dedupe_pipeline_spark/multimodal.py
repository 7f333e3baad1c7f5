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
    """Real codec entry point for compressed formats (JPEG/MP3/H.264) — NOT
    AVAILABLE in this container (no PIL / ffmpeg). Production swaps this in.
    Uncompressed containers ARE decoded for real — see builtin_decode."""
    raise NotImplementedError(
        "compressed-media decoding requires image/audio libraries not present "
        "in this environment; use builtin_decode (PPM/WAV, pure numpy) or "
        "fake_decode (deterministic stand-in)"
    )


# --- real decoders for uncompressed containers (pure numpy, no codecs) -------

FEAT_DIM = 16


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) image and return a FEAT_DIM-bin normalized
    luminance histogram — a REAL pixels-in features-out path with zero
    external codecs. Raises ValueError on malformed input."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixel data;
    # '#' comments may appear inside header whitespace
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    rgb = px.reshape(h, w, 3).astype(np.float32)
    lum = rgb @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=FEAT_DIM, range=(0.0, 256.0))
    return (hist / max(lum.size, 1)).astype(np.float32)


def decode_wav(payload: bytes) -> np.ndarray:
    """Parse a PCM-16 WAV (RIFF) container and return FEAT_DIM per-segment
    RMS energies normalized to [0,1] — real samples-in features-out."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt_ok, data = False, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM-16 supported")
            fmt_ok = True
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(
        np.float32
    ) / 32768.0
    if samples.size == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    seg = np.array_split(samples, FEAT_DIM)
    return np.array(
        [float(np.sqrt(np.mean(s * s))) if s.size else 0.0 for s in seg],
        dtype=np.float32,
    )


def builtin_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Magic-byte-sniffing REAL decoder for the uncompressed containers this
    environment can handle without codec libraries: PPM (P6) images and
    PCM-16 WAV audio. Anything else raises — compressed formats need
    real_decode with PIL/ffmpeg."""
    if payload is None:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    b = bytes(payload)
    if b.startswith(b"P6"):
        return decode_ppm(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return decode_wav(b)
    return real_decode(b, media_type)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """Minimal P6 writer (tests/synthesis)."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal PCM-16 WAV writer (tests/synthesis)."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


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
    """Deterministic fake media table for tests (opaque random payloads)."""
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


def synth_real_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL decodable containers: P6 PPM
    images and PCM-16 WAV clips (pure-numpy encoders above)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(4, 48)), int(rng.integers(4, 48))
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, "image", bytearray(encode_ppm(rgb)), w, h, None))
        else:
            n_samp = int(rng.integers(256, 4096))
            wav = encode_wav(rng.standard_normal(n_samp) * 0.3)
            rows.append(
                (i, "audio", bytearray(wav), None, None, n_samp * 1000 // 16000)
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
