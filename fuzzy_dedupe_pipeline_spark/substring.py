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

The rolling hash runs ONCE over the flattened Arrow batch (the same
invertible-multiplier prefix trick as minhash.gram_hashes_flat — the window
hash sum_j h[s+j] * C^(w-1-j) is translation-invariant, so global-position
powers give identical values to per-row powers; windows never cross row
boundaries because starts are generated per row). Only the q-window sliding
min + np.unique run per row, over the precomputed gram slice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.minhash import _U64, gram_hashes_flat


def batch_winnow(token_hash_rows: list, w: int, q: int) -> list[np.ndarray]:
    """Winnowed fingerprints per row for a whole Arrow batch: one flattened
    rolling-hash pass (all rows' gram windows at once), then the per-row
    sliding-window min + unique over each row's precomputed gram slice."""
    n_rows = len(token_hash_rows)
    empty = np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(r) for r in token_hash_rows), dtype=np.int64, count=n_rows)
    counts = np.maximum(lens - w + 1, 0)  # rows shorter than one gram emit none
    n_windows = int(counts.sum())
    if n_windows == 0:
        return [empty] * n_rows
    flat = np.concatenate(
        [np.asarray(r, dtype=np.int64) for r in token_hash_rows]
    ).view(_U64)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    row_of_window = np.repeat(np.arange(n_rows), counts)
    excl = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=excl[1:])
    intra = np.arange(n_windows, dtype=np.int64) - np.repeat(excl, counts)
    starts = offsets[row_of_window] + intra
    widths = np.full(n_windows, w, dtype=np.int64)
    grams = gram_hashes_flat(flat, starts, widths)

    out: list[np.ndarray] = []
    pos = 0
    for c in counts:
        if c == 0:
            out.append(empty)
            continue
        g = grams[pos : pos + c]
        pos += c
        if c <= q:
            out.append(np.array([g.min()], dtype=_U64).view(np.int64))
        else:
            windows = np.lib.stride_tricks.sliding_window_view(g, q)
            out.append(np.unique(windows.min(axis=1)).view(np.int64))
    return out


def make_winnow_udf(cfg: DedupeConfig):
    w = cfg.substring_gram
    q = cfg.winnow_window

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(token_hashes: pd.Series) -> pd.Series:
        return pd.Series(batch_winnow(list(token_hashes), w, q))

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
