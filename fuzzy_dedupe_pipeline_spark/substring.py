"""Winnowed rolling-hash substring fingerprints (suffix-array substitute).

North rule: detect exact long-substring duplicates. A distributed suffix
array over 10^12 docs is not Spark-shaped; the standard scalable equivalent is
document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken — "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD'03): hash every
`gram`-token window with a rolling polynomial hash, then keep only the minimum
hash in each window of `winnow_window` consecutive gram hashes. Guarantee: any
shared token run of length >= gram + winnow_window - 1 (default 35+16-1 = 50)
yields at least one shared fingerprint — exactly the planted >=50-token-run
family. Fingerprint equality is then an equi-join, like LSH bands.

The rolling hash is computed in ONE vectorized pass per row using the
invertible-multiplier prefix trick: with odd C, C^-1 exists mod 2^64, so
  g[i] = (T[i+w] - T[i]) * C^(i+w-1),  T = cumsum(h[j] * Cinv^j)
— all wraparound uint64 numpy ops, then a splitmix64 finalizer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.minhash import _splitmix64, _U64

_C = _U64(0x5DEECE66D_B)  # odd multiplier
_C_INV = _U64(pow(int(_C), -1, 1 << 64))


def make_winnow_udf(cfg: DedupeConfig):
    w = cfg.substring_gram
    q = cfg.winnow_window

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(token_hashes: pd.Series) -> pd.Series:
        out = []
        empty = np.empty(0, dtype=np.int64)
        for row in token_hashes:
            n = len(row)
            if n < w:
                out.append(empty)
                continue
            h = np.asarray(row, dtype=np.int64).view(_U64)
            with np.errstate(over="ignore"):
                # cinv_pow[j] == C^-j : cumprod gives C^-(j+1), shift by one C
                cinv_pow = np.cumprod(np.full(n, _C_INV, dtype=_U64)) * _C
                t = np.zeros(n + 1, dtype=_U64)
                np.cumsum(h * cinv_pow, out=t[1:])
                n_grams = n - w + 1
                # c_pow[i] == C^(i+w-1) : cumprod gives C^(i+1), scale by C^(w-2)
                scale = _U64(pow(int(_C), w - 2, 1 << 64)) if w >= 2 else _C_INV
                c_pow = np.cumprod(np.full(n_grams, _C, dtype=_U64)) * scale
                g = _splitmix64((t[w : w + n_grams] - t[:n_grams]) * c_pow)
                if n_grams <= q:
                    fps = np.array([g.min()], dtype=_U64)
                else:
                    windows = np.lib.stride_tricks.sliding_window_view(g, q)
                    fps = np.unique(windows.min(axis=1))
            out.append(fps.view(np.int64))
        return pd.Series(out)

    return winnow


def substring_candidates(
    pages: DataFrame,
    cfg: DedupeConfig,
    id_col: str = "id",
    tokens_col_name: str = "tokens",
    persists: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs sharing >=1 winnowed fingerprint.

    Input needs (id, tokens array<string>). Same equi-join + hot-bucket-cap
    shape as the LSH stage. Returns (pairs(id1,id2), dropped_fingerprints).
    persists: caller-owned registry of persisted frames (see lsh.candidate_pairs).
    """
    winnow_udf = make_winnow_udf(cfg)
    fps = (
        pages.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(tokens_col_name), lambda t: F.xxhash64(t)).alias("th"),
        )
        .withColumn("fp", F.explode(winnow_udf(F.col("th"))))
        .select("id", "fp")
        .dropDuplicates(["id", "fp"])
        # fps feeds three plan branches (bucket sizes, both self-join sides);
        # without persist the tokenize+winnow UDF chain re-executes per branch
        .persist()
    )
    if persists is not None:
        persists.append(fps)
    sizes = fps.groupBy("fp").agg(F.count("*").alias("bucket_size"))
    dropped = sizes.filter(F.col("bucket_size") > cfg.max_band_bucket)
    ok = fps.join(F.broadcast(dropped.select("fp")), ["fp"], "left_anti")

    pairs = (
        ok.alias("a")
        .join(ok.alias("b"), "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return pairs, dropped
