"""Shingling + MinHash + SimHash signatures.

Role parity: the reference turns each record into fixed-width signatures whose
similarity approximates record similarity (sentence-transformer embeddings,
dedupe_logic/processor.py:62-108). Per the north rule we substitute:

  * k-word shingles of normalize_text output -> hashed JVM-side with xxhash64
    (built-in, codegen'd; the shingle *set* is also what exact-Jaccard
    verification uses, so candidate generation and verification share one
    representation)
  * MinHash signature (num_hashes lanes) -> computed in ONE Arrow pandas UDF,
    fully vectorized with numpy (splitmix64 re-mix per lane + min.reduceat) —
    no per-row Python
  * SimHash 64-bit fingerprint -> same UDF, bit-vote over shingle hashes

Determinism: lane seeds derive from DedupeConfig.seed via splitmix64; same
config -> identical signatures on any cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.normalize import tokens_col

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a high-quality 64-bit mixer; with distinct seeds
    it yields effectively independent hash lanes for MinHash."""
    z = x + _GOLDEN
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def lane_seeds(num_hashes: int, seed: int) -> np.ndarray:
    base = _splitmix64(np.arange(1, num_hashes + 1, dtype=_U64) * _U64(seed * 2 + 1))
    return base.astype(_U64)


def shingles_col(tokens: Column, k: int) -> Column:
    """Distinct xxhash64 of each k-word shingle, computed JVM-side.

    <k tokens -> single whole-string shingle (mirrors oracle.shingle_set);
    0 tokens -> empty array.
    """
    whole = F.array(F.xxhash64(F.concat_ws(" ", tokens)))
    n = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i + 1, k))),
    )
    return F.array_distinct(
        F.when(n == 0, F.array().cast("array<bigint>"))
        .when(n < k, whole)
        .otherwise(grams)
    )


def make_signature_udf(cfg: DedupeConfig):
    """Arrow UDF: shingle-hash array -> (minhash array<long>, simhash long).

    Vectorized across the whole Arrow batch: all rows' shingles are flattened
    into one uint64 vector; each MinHash lane is one splitmix64 re-mix pass +
    np.minimum.reduceat over row offsets. SimHash is a bit-vote matrix reduced
    with np.add.reduceat. Zero per-row Python in the hot loop.
    """
    seeds = lane_seeds(cfg.num_hashes, cfg.seed)
    num_hashes = cfg.num_hashes
    empty_sig = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)

    ret = T.StructType(
        [
            T.StructField("minhash", T.ArrayType(T.LongType()), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    @F.pandas_udf(ret)
    def signature(shingles: pd.Series) -> pd.DataFrame:
        n_rows = len(shingles)
        lens = np.fromiter((len(s) for s in shingles), dtype=np.int64, count=n_rows)
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "minhash": [empty_sig] * n_rows,
                    "simhash": np.zeros(n_rows, dtype=np.int64),
                }
            )
        flat = np.concatenate([np.asarray(s, dtype=np.int64) for s in shingles]).view(_U64)
        offsets = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0
        # reduceat needs strictly valid segment starts; run it on non-empty
        # rows only, then scatter back
        ne_offsets = offsets[nonempty]

        with np.errstate(over="ignore"):
            sigs = np.empty((n_rows, num_hashes), dtype=np.int64)
            sigs[~nonempty] = empty_sig
            lane_min = np.empty((ne_offsets.size, num_hashes), dtype=np.uint64)
            for j in range(num_hashes):
                mixed = _splitmix64(flat ^ seeds[j])
                lane_min[:, j] = np.minimum.reduceat(mixed, ne_offsets)
            sigs[nonempty] = lane_min.view(np.int64)

            # SimHash: per-bit vote sum over shingles
            bits = ((flat[:, None] >> np.arange(64, dtype=_U64)) & _U64(1)).astype(
                np.int32
            )
            votes = np.add.reduceat(2 * bits - 1, ne_offsets, axis=0)
            packed = np.zeros(n_rows, dtype=np.uint64)
            bitvals = (votes > 0).astype(np.uint64) << np.arange(64, dtype=_U64)
            packed[nonempty] = bitvals.sum(axis=1, dtype=np.uint64)

        return pd.DataFrame(
            {"minhash": list(sigs), "simhash": packed.view(np.int64)}
        )

    return signature


def with_signatures(
    pages: DataFrame, cfg: DedupeConfig, id_col: str = "url", text_col: str = "text_norm"
) -> DataFrame:
    """id, n_tokens, shingles, minhash, simhash for every page.

    Docs with zero shingles are kept here (callers filter before banding so
    empty docs can't flood LSH buckets).
    """
    sig_udf = make_signature_udf(cfg)
    toks = tokens_col(F.col(text_col))
    out = (
        pages.select(
            F.col(id_col).alias("id"),
            F.size(toks).alias("n_tokens"),
            shingles_col(toks, cfg.shingle_k).alias("shingles"),
        )
        .withColumn("sig", sig_udf(F.col("shingles")))
        .select(
            "id",
            "n_tokens",
            "shingles",
            F.col("sig.minhash").alias("minhash"),
            F.col("sig.simhash").alias("simhash"),
        )
    )
    return out


def band_hashes_col(minhash: Column, cfg: DedupeConfig) -> Column:
    """array of lsh_bands hashes: band i = xxhash64(i, sig[i*r : i*r+r]).
    JVM-side; feeds posexplode in the LSH stage."""
    r = cfg.lsh_rows
    return F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda i: F.xxhash64(i, F.slice(minhash, i * r + 1, r)),
    )


def simhash_similarity_col(s1: Column, s2: Column) -> Column:
    """1 - hamming/64 over the SimHash fingerprints — the secondary signal
    standing in for the reference's address-embedding cosine
    (dedupe_logic/processor.py:153)."""
    return 1.0 - F.bit_count(s1.bitwiseXOR(s2)) / F.lit(64.0)
