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
from fuzzy_dedupe_pipeline_spark.normalize import tokens_col, tokens_raw_col

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


def token_hashes_col(tokens: Column) -> Column:
    """xxhash64 per token — the ONLY lambda here binds the element variable,
    so the tokens array is evaluated exactly once per row.

    (Earlier design computed shingles JVM-side as
    `transform(sequence(...), i -> xxhash64(slice(tokens, i+1, k)))`; any
    non-lambda-bound expression inside a higher-order-function lambda is
    re-evaluated PER ELEMENT, so the tokenize/normalize chain ran O(n) times
    per row — O(n^2) regex work. Shingle assembly now happens in the Arrow UDF
    from these per-token hashes.)
    """
    return F.transform(tokens, lambda t: F.xxhash64(t))


# --- rolling k-gram hashes (vectorized) --------------------------------------

_RC = _U64(0x5DEECE66DB)  # odd multiplier -> invertible mod 2^64
_RC_INV = _U64(pow(0x5DEECE66DB, -1, 1 << 64))


def gram_hashes_flat(flat: np.ndarray, starts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Polynomial hash of each token window (start, width) over the flat
    uint64 token-hash vector, all windows at once.

      g = splitmix64( (T[s+w] - T[s]) * C^(s+w-1) ),
      T = prefix-cumsum of h[j] * C^-j   (wraparound uint64; C odd => C^-1 exists)

    Equivalent to sum_{j} h[s+j] * C^(w-1-j) — order-sensitive, so distinct
    token sequences get distinct hashes (mod 2^-64 collisions).
    """
    total = flat.size
    with np.errstate(over="ignore"):
        cinv_pow = np.cumprod(np.full(total, _RC_INV, dtype=_U64)) * _RC  # C^-j
        t = np.zeros(total + 1, dtype=_U64)
        np.cumsum(flat * cinv_pow, out=t[1:])
        c_pow = np.cumprod(np.full(total, _RC, dtype=_U64)) * _RC_INV  # C^i
        ends = starts + widths
        return _splitmix64((t[ends] - t[starts]) * c_pow[ends - 1])


def batch_shingle_sets(token_hash_rows: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Per-row DISTINCT k-gram shingle hashes for a whole Arrow batch.

    The rolling-hash math runs once over the flattened batch (gram windows
    never cross row boundaries because each row's windows are generated from
    its own offsets); only the per-row np.unique runs row-at-a-time.
    Rows with 0 < n < k get one whole-row shingle (mirrors oracle.shingle_set).
    """
    n_rows = len(token_hash_rows)
    lens = np.fromiter((len(r) for r in token_hash_rows), dtype=np.int64, count=n_rows)
    total = int(lens.sum())
    if total == 0:
        return [np.empty(0, dtype=np.int64)] * n_rows
    flat = np.concatenate(
        [np.asarray(r, dtype=np.int64) for r in token_hash_rows]
    ).view(_U64)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])

    counts = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    widths_per_row = np.minimum(lens, k)
    n_windows = int(counts.sum())
    # window starts: offsets repeated + intra-row arange
    row_of_window = np.repeat(np.arange(n_rows), counts)
    excl = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=excl[1:])
    intra = np.arange(n_windows, dtype=np.int64) - np.repeat(excl, counts)
    starts = offsets[row_of_window] + intra
    widths = widths_per_row[row_of_window]
    grams = gram_hashes_flat(flat, starts, widths).view(np.int64)

    out: list[np.ndarray] = []
    pos = 0
    for c in counts:
        out.append(np.unique(grams[pos : pos + c]) if c else np.empty(0, dtype=np.int64))
        pos += c
    return out


def make_signature_udf(cfg: DedupeConfig):
    """Arrow UDF: token-hash array -> (shingles array<long>, minhash
    array<long>, simhash long).

    Vectorized across the whole Arrow batch: shingle construction is one
    rolling-hash pass over the flattened batch; each MinHash lane is one
    splitmix64 re-mix + np.minimum.reduceat over row offsets; SimHash is a
    per-bit majority vote via np.add.reduceat. The only per-row Python is
    np.unique + output assembly.
    """
    seeds = lane_seeds(cfg.num_hashes, cfg.seed)
    num_hashes = cfg.num_hashes
    k = cfg.shingle_k
    empty_sig = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)

    ret = T.StructType(
        [
            T.StructField("n_tokens", T.IntegerType(), False),
            T.StructField("shingles", T.ArrayType(T.LongType()), False),
            T.StructField("minhash", T.ArrayType(T.LongType()), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    @F.pandas_udf(ret)
    def signature(token_hashes: pd.Series) -> pd.DataFrame:
        n_rows = len(token_hashes)
        rows = list(token_hashes)
        # n_tokens computed here, NOT as a separate F.size(tokens) projection —
        # that would duplicate the whole normalize/tokenize chain in the plan
        n_tokens = np.fromiter((len(r) for r in rows), dtype=np.int32, count=n_rows)
        shingle_rows = batch_shingle_sets(rows, k)
        lens = np.fromiter((len(s) for s in shingle_rows), dtype=np.int64, count=n_rows)
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "n_tokens": n_tokens,
                    "shingles": shingle_rows,
                    "minhash": [empty_sig] * n_rows,
                    "simhash": np.zeros(n_rows, dtype=np.int64),
                }
            )
        flat = np.concatenate(shingle_rows).view(_U64)
        offsets = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0

        # Chunked over rows so every lane's temporaries are L2-CACHE-RESIDENT.
        # The naive form (each of 128 lanes remixes the WHOLE batch's flat
        # shingle vector) allocates ~6 full-batch temporaries per lane — at a
        # 4096-doc batch that is gigabytes of DRAM traffic per batch, and the
        # signature stage becomes memory-bandwidth-bound: measured per-TASK
        # time barely dropped when the corpus split across 4x more tasks
        # (43.6s med @ 8 tasks -> 34.5s med @ 32 tasks on 1/4 the rows),
        # because 32 concurrent tasks saturate one memory controller. With
        # <=32k-shingle chunks (256 KB) the lane loop re-reads cache-hot data
        # and DRAM sees ~one pass over the batch; the stage scales with cores
        # again.
        CHUNK = 1 << 15
        cum = np.cumsum(lens)
        sigs = np.empty((n_rows, num_hashes), dtype=np.int64)
        sigs[~nonempty] = empty_sig
        packed = np.zeros(n_rows, dtype=np.uint64)

        with np.errstate(over="ignore"):
            r0 = 0
            while r0 < n_rows:
                base = cum[r0 - 1] if r0 else 0
                r1 = int(np.searchsorted(cum, base + CHUNK, side="left")) + 1
                r1 = min(max(r1, r0 + 1), n_rows)
                lens_c = lens[r0:r1]
                ne_c = lens_c > 0
                if not ne_c.any():
                    r0 = r1
                    continue
                fchunk = flat[base : base + int(lens_c.sum())]
                rel_off = (offsets[r0:r1] - base)[ne_c]
                lane_min = np.empty((rel_off.size, num_hashes), dtype=np.uint64)
                for j in range(num_hashes):
                    mixed = _splitmix64(fchunk ^ seeds[j])
                    lane_min[:, j] = np.minimum.reduceat(mixed, rel_off)
                out_rows = np.arange(r0, r1)[ne_c]
                sigs[out_rows] = lane_min.view(np.int64)

                # SimHash majority vote, same cache-resident chunk
                ne_lens = lens_c[ne_c].view(_U64)
                packed_ne = np.zeros(rel_off.size, dtype=_U64)
                for b in range(64):
                    ones = np.add.reduceat(
                        (fchunk >> _U64(b)) & _U64(1), rel_off
                    )
                    packed_ne |= (ones * _U64(2) > ne_lens).astype(_U64) << _U64(b)
                packed[out_rows] = packed_ne
                r0 = r1

        return pd.DataFrame(
            {
                "n_tokens": n_tokens,
                "shingles": shingle_rows,
                "minhash": list(sigs),
                "simhash": packed.view(np.int64),
            }
        )

    return signature


def make_simhash_udf(cfg: DedupeConfig):
    """Arrow UDF: token-hash array -> (n_shingles int, simhash long).

    The simhash-only projection of make_signature_udf: identical shingle sets
    (batch_shingle_sets, same k) and the identical per-bit majority vote, with
    the 128-lane MinHash loop skipped AND the Arrow payload reduced to 12
    bytes/row (no shingle or minhash arrays cross the Arrow boundary).
    Callers that need only the fingerprint — simhash_near_dup_pairs bands on
    (chunk_id, chunk_val) and re-reads nothing else — pay for only the
    fingerprint. Bit votes are chunked to L2 like the full UDF, so the stage
    stays CPU-bound at high core counts.
    """
    k = cfg.shingle_k
    ret = T.StructType(
        [
            T.StructField("n_shingles", T.IntegerType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    @F.pandas_udf(ret)
    def simhash_sig(token_hashes: pd.Series) -> pd.DataFrame:
        rows = list(token_hashes)
        n_rows = len(rows)
        shingle_rows = batch_shingle_sets(rows, k)
        lens = np.fromiter((len(s) for s in shingle_rows), dtype=np.int64, count=n_rows)
        packed = np.zeros(n_rows, dtype=_U64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(shingle_rows).view(_U64)
            offsets = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            cum = np.cumsum(lens)
            CHUNK = 1 << 15
            with np.errstate(over="ignore"):
                r0 = 0
                while r0 < n_rows:
                    base = cum[r0 - 1] if r0 else 0
                    r1 = int(np.searchsorted(cum, base + CHUNK, side="left")) + 1
                    r1 = min(max(r1, r0 + 1), n_rows)
                    lens_c = lens[r0:r1]
                    ne_c = lens_c > 0
                    if not ne_c.any():
                        r0 = r1
                        continue
                    fchunk = flat[base : base + int(lens_c.sum())]
                    rel_off = (offsets[r0:r1] - base)[ne_c]
                    ne_lens = lens_c[ne_c].view(_U64)
                    packed_ne = np.zeros(rel_off.size, dtype=_U64)
                    for b in range(64):
                        ones = np.add.reduceat(
                            (fchunk >> _U64(b)) & _U64(1), rel_off
                        )
                        packed_ne |= (ones * _U64(2) > ne_lens).astype(_U64) << _U64(b)
                    packed[np.arange(r0, r1)[ne_c]] = packed_ne
                    r0 = r1
        return pd.DataFrame(
            {
                "n_shingles": lens.astype(np.int32),
                "simhash": packed.view(np.int64),
            }
        )

    return simhash_sig


def make_verify_udf(cfg: DedupeConfig):
    """Arrow UDF: token-hash array -> (shingles array<long>, simhash long).

    The verify-slice projection of make_signature_udf (r6): verify_pairs
    reads ONLY the shingle sets (Jaccard/containment) and the simhash
    fingerprint — the 128 MinHash lanes the full UDF computes were thrown
    away on the second (candidate-endpoint) signature pass. Shingles and
    simhash come from the identical batch_shingle_sets + bit-vote code, so
    the verify scores are unchanged; the lane loop — the UDF's dominant
    compute — is simply skipped.
    """
    k = cfg.shingle_k
    ret = T.StructType(
        [
            T.StructField("shingles", T.ArrayType(T.LongType()), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    @F.pandas_udf(ret)
    def verify_sig(token_hashes: pd.Series) -> pd.DataFrame:
        rows = list(token_hashes)
        n_rows = len(rows)
        shingle_rows = batch_shingle_sets(rows, k)
        lens = np.fromiter(
            (len(s) for s in shingle_rows), dtype=np.int64, count=n_rows
        )
        packed = np.zeros(n_rows, dtype=_U64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(shingle_rows).view(_U64)
            offsets = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            cum = np.cumsum(lens)
            CHUNK = 1 << 15
            with np.errstate(over="ignore"):
                r0 = 0
                while r0 < n_rows:
                    base = cum[r0 - 1] if r0 else 0
                    r1 = int(np.searchsorted(cum, base + CHUNK, side="left")) + 1
                    r1 = min(max(r1, r0 + 1), n_rows)
                    lens_c = lens[r0:r1]
                    ne_c = lens_c > 0
                    if not ne_c.any():
                        r0 = r1
                        continue
                    fchunk = flat[base : base + int(lens_c.sum())]
                    rel_off = (offsets[r0:r1] - base)[ne_c]
                    ne_lens = lens_c[ne_c].view(_U64)
                    packed_ne = np.zeros(rel_off.size, dtype=_U64)
                    for b in range(64):
                        ones = np.add.reduceat(
                            (fchunk >> _U64(b)) & _U64(1), rel_off
                        )
                        packed_ne |= (ones * _U64(2) > ne_lens).astype(_U64) << _U64(b)
                    packed[np.arange(r0, r1)[ne_c]] = packed_ne
                    r0 = r1
        return pd.DataFrame(
            {"shingles": shingle_rows, "simhash": packed.view(np.int64)}
        )

    return verify_sig


def with_verify_sigs(
    pages: DataFrame,
    cfg: DedupeConfig,
    id_col: str = "url",
    text_col: str = "text_norm",
) -> DataFrame:
    """id, shingles, simhash — exactly the columns verify_pairs consumes
    (see make_verify_udf). Input text must be pre-normalized."""
    sig_udf = make_verify_udf(cfg)
    return (
        pages.select(
            F.col(id_col).alias("id"),
            token_hashes_col(tokens_raw_col(F.col(text_col))).alias(
                "token_hashes"
            ),
        )
        .withColumn("sig", sig_udf(F.col("token_hashes")))
        .select(
            "id",
            F.col("sig.shingles").alias("shingles"),
            F.col("sig.simhash").alias("simhash"),
        )
    )


def with_simhash(
    pages: DataFrame,
    cfg: DedupeConfig,
    id_col: str = "url",
    text_col: str = "text_norm",
    pre_normalized: bool = True,
) -> DataFrame:
    """id, n_shingles, simhash — the narrow twin of with_signatures for
    consumers that never touch minhash/shingles (see make_simhash_udf)."""
    sig_udf = make_simhash_udf(cfg)
    toks = tokens_raw_col(F.col(text_col)) if pre_normalized else tokens_col(
        F.col(text_col)
    )
    return (
        pages.select(
            F.col(id_col).alias("id"),
            token_hashes_col(toks).alias("token_hashes"),
        )
        .withColumn("sig", sig_udf(F.col("token_hashes")))
        .select(
            "id",
            F.col("sig.n_shingles").alias("n_shingles"),
            F.col("sig.simhash").alias("simhash"),
        )
    )


def with_signatures(
    pages: DataFrame,
    cfg: DedupeConfig,
    id_col: str = "url",
    text_col: str = "text_norm",
    pre_normalized: bool = True,
) -> DataFrame:
    """id, n_tokens, shingles, minhash, simhash for every page.

    pre_normalized: text_col already went through normalize_text_col (the
    standard dataflow — clean_docs runs first). Normalization is idempotent,
    so skipping the re-normalize only removes two regex passes per doc from
    the plan, not any semantics. Pass False for raw text.

    Docs with zero shingles are kept here (callers filter before banding so
    empty docs can't flood LSH buckets).
    """
    sig_udf = make_signature_udf(cfg)
    toks = tokens_raw_col(F.col(text_col)) if pre_normalized else tokens_col(
        F.col(text_col)
    )
    out = (
        pages.select(
            F.col(id_col).alias("id"),
            token_hashes_col(toks).alias("token_hashes"),
        )
        .withColumn("sig", sig_udf(F.col("token_hashes")))
        .select(
            "id",
            F.col("sig.n_tokens").alias("n_tokens"),
            F.col("sig.shingles").alias("shingles"),
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
