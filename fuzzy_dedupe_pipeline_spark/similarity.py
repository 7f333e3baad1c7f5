"""Similarity search over an embedding column (array<float>).

Two paths, per the scale playbook:
  * brute-force cosine top-k — exact baseline; broadcast the (small) query set
    against the corpus, dot products as built-in zip_with/aggregate
    expressions (JVM, codegen'd — no Python in the hot loop)
  * LSH-bucketed top-k — scale path: random-hyperplane signatures bucket the
    corpus (one vectorized Arrow UDF: matmul + packbits), candidates are
    bucket-colliders (multi-probe over all sign-bit tables), exact rerank
    inside buckets. At 100 TB the bucket join replaces the corpus-wide cross
    product; recall is tuned by n_tables x n_bits like MinHash banding.

The reference's FAISS IndexFlatIP role (dedupe_logic/processor.py:120-138)
maps to the brute-force path; the LSH path is what survives 1000 executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine_col(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    n2 = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).otherwise(F.lit(0.0))


# --- fixed-dim fast path ----------------------------------------------------
#
# The HOF form above (aggregate over zip_with) runs INTERPRETED: Catalyst
# evaluates the lambda per element per row with no whole-stage codegen, and
# zip_with allocates an intermediate array per pair. For a pairwise similarity
# join that expression dominates the query (guide §1.2 "per-task work").
# When the embedding dimension is statically known, the identical arithmetic
# unrolls into a flat Add/Multiply tree that whole-stage codegen compiles to
# straight-line JVM code — SAME left-fold association ((0.0+p0)+p1)+...,
# SAME per-element double casts, so results are bit-identical to the HOF form
# (IEEE addition order preserved; Java does not re-associate or auto-FMA).
# NULL semantics match for well-formed (equal-length, dim-sized) vectors;
# vectors shorter than dim yield NULL here vs a partial sum in the HOF form —
# callers pass `dim` only for tables whose vectors are all exactly dim-long.


def _dot_unrolled(a, b, dim: int):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
    return acc


def _norm_unrolled(a, dim: int):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        v = F.element_at(a, i).cast("double")
        acc = acc + v * v
    return F.sqrt(acc)


def _dot_guarded(a, b, dim: int):
    """dot(a, b): unrolled codegen path when both arrays are exactly dim
    long (lazily-evaluated CASE branch), original HOF fold otherwise —
    value-equal to _cosine_col's dot for EVERY input."""
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), _dot_unrolled(a, b, dim)
    ).otherwise(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _norm_guarded(a, dim: int):
    """sqrt(sum sq): unrolled when the array is exactly dim long, HOF fold
    otherwise — value-equal to _cosine_col's norms for EVERY input."""
    return F.when(F.size(a) == dim, _norm_unrolled(a, dim)).otherwise(
        F.sqrt(
            F.aggregate(
                a,
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        )
    )


def _cosine_from_parts(dot, n1, n2):
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    dim_hint: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k, self-match excluded.

    queries must be broadcast-small (the common ANN-serving shape); the corpus
    side streams. Deterministic total order: cosine desc, neighbor_id asc.

    Norms are precomputed per ROW before the pair join (same expression value,
    computed n+q times instead of n*q times) and the per-pair dot runs the
    guarded unrolled path (see _dot_guarded) — bit-identical results.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("_qn", _norm_guarded(F.col("qvec"), dim_hint))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("_cn", _norm_guarded(F.col("cvec"), dim_hint))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_parts(
                    _dot_guarded(F.col("qvec"), F.col("cvec"), dim_hint),
                    F.col("_qn"),
                    F.col("_cn"),
                ),
                round_dp,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    block_col: str | None = None,
    dim_hint: int = 64,
    salt: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id1, id2, cosine) with
    id1 < id2 and round(cosine, round_dp) >= threshold.

    Exact all-pairs variant (the verification baseline). At 100 TB this self
    cross-join is infeasible corpus-wide — pass block_col (a cluster/prefix/
    LSH-bucket column) to restrict the join to equi-blocks Catalyst shuffles
    on, or generate candidates with lsh_ann_topk and verify those pairs only.

    Per-pair work is the guarded unrolled dot (codegen; see _dot_guarded) and
    norms are precomputed per ROW before the join — O(n) norm computations
    instead of O(pairs), value-identical to the HOF form for every input.

    salt > 1 sub-splits each block for parallelism (guide §2.5): when the
    block column has FEWER distinct values than the cluster has cores (10
    labels vs 32 cores here), the equi-join leaves most tasks empty. The
    left side gets a deterministic sub-bucket xxhash64(id)%salt, the right
    side is replicated once per sub-bucket, and the join keys on
    (block, sub-bucket) — every within-block pair still appears exactly
    once (at the left row's sub-bucket), so the output is identical. Use
    only when blocks are few and large; a web-scale block key (LSH bucket /
    IVF list) already outnumbers cores, where salt=1 avoids the x-salt
    replication.
    """
    left_cols = [F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")]
    right_cols = [F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")]
    if block_col is not None:
        left_cols.append(F.col(block_col).alias("b1"))
        right_cols.append(F.col(block_col).alias("b2"))
    a = corpus.select(*left_cols).withColumn(
        "_n1", _norm_guarded(F.col("v1"), dim_hint)
    )
    b = corpus.select(*right_cols).withColumn(
        "_n2", _norm_guarded(F.col("v2"), dim_hint)
    )
    cond = F.col("id1") < F.col("id2")
    if block_col is not None:
        cond = (F.col("b1") == F.col("b2")) & cond
        if salt > 1:
            a = a.withColumn(
                "_sa", F.pmod(F.xxhash64(F.col("id1")), F.lit(salt))
            )
            b = b.withColumn(
                "_sb",
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))
                ),
            )
            cond = (F.col("_sa") == F.col("_sb")) & cond
    return (
        a.join(b, cond)
        .select(
            "id1",
            "id2",
            F.round(
                _cosine_from_parts(
                    _dot_guarded(F.col("v1"), F.col("v2"), dim_hint),
                    F.col("_n1"),
                    F.col("_n2"),
                ),
                round_dp,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _seq_dot(l64: np.ndarray, r64: np.ndarray) -> np.ndarray:
    """Pairwise dot products with the EXACT IEEE association of the engine's
    fold ((0.0 + p0) + p1) + ...: one vectorized accumulation step per
    dimension, so every pair's sum is bit-identical to the JVM expression
    (numpy += on float64 is the same correctly-rounded IEEE add; no BLAS
    matmul, whose blocked summation would reassociate)."""
    acc = np.zeros((l64.shape[0], r64.shape[0]))
    for k in range(l64.shape[1]):
        acc += l64[:, k, None] * r64[None, :, k]
    return acc


def _seq_sqnorm(m64: np.ndarray) -> np.ndarray:
    acc = np.zeros(m64.shape[0])
    for k in range(m64.shape[1]):
        acc += m64[:, k] * m64[:, k]
    return acc


# left-tile size for blocked_pairs_arrow's pair matrices (module level so
# tests can shrink it to exercise the tiled path)
_PAIR_TILE = 512


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Arrow fast path of brute_force_topk: identical output, numpy scoring.

    The expression form evaluates an interpreted per-pair cosine over the
    full corpus x queries product. Here the (broadcast-small) query set is
    collected once to the driver — the same O(small-side) collect the IVF
    centroid fit uses — and closed over by a mapInPandas scorer that
    computes each batch's cosines with the bit-exact sequential-dimension
    accumulation (_seq_dot), then PRESELECTS per query the rows that could
    possibly reach the global rounded top-k:

      * a row is dropped only when >= k rows in its own batch tile have raw
        cosine greater by more than 2*10^-dp — rounding (monotone, error
        <= 0.5*10^-dp) then puts it STRICTLY below k rows, so no id
        tie-break can rescue it;
      * NULL-cosine pairs (mixed lengths with positive norms — the
        expression form's NULL) are kept (smallest neighbor ids, up to k)
        only when a tile has fewer than k non-NULL rows: desc ordering is
        NULLS LAST, and any tile with k non-NULL rows globally outranks
        every NULL;
      * degenerate pairs (null vector, zero/NaN norm) carry value 0.0
        exactly as the expression form does.

    The final round(raw, dp) + row_number window + rank filter run in Spark
    expressions on the tiny preselected set, so rounding and ordering
    semantics are exactly the engine's.
    """
    import pandas as pd  # noqa: F811

    qrows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qvecs = [r["qv"] for r in qrows]
    qlens = np.fromiter(
        (len(v) if v is not None else -1 for v in qvecs),
        dtype=np.int64,
        count=len(qvecs),
    )
    # per-length query matrices + norms, prebuilt once
    qgroups = {}
    q_posnorm = np.zeros(len(qvecs), dtype=bool)
    for L in np.unique(qlens):
        if L <= 0:
            continue
        sel = np.flatnonzero(qlens == L)
        qm = np.vstack([qvecs[i] for i in sel]).astype(np.float64)
        qn = np.sqrt(_seq_sqnorm(qm))
        q_posnorm[sel] = qn > 0
        qgroups[int(L)] = (sel, qm, qn)
    n_q = len(qvecs)
    margin = 2.0 * 10.0 ** (-round_dp)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("_raw", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = pdf[vec_col].tolist()
            for s in range(0, len(ids), _PAIR_TILE):
                tids = ids[s : s + _PAIR_TILE]
                tvecs = vecs[s : s + _PAIR_TILE]
                lens = np.fromiter(
                    (len(v) if v is not None else -1 for v in tvecs),
                    dtype=np.int64,
                    count=len(tvecs),
                )
                cos = np.zeros((len(tids), n_q))
                c_posnorm = np.zeros(len(tids), dtype=bool)
                for L in np.unique(lens):
                    if L <= 0 or int(L) not in qgroups:
                        # corpus rows of a length no query has: NULL vs
                        # every positive-norm query, 0.0 vs the rest —
                        # norms still needed for the exclusion mask
                        if L > 0:
                            csel = np.flatnonzero(lens == L)
                            cm = np.vstack(
                                [tvecs[i] for i in csel]
                            ).astype(np.float64)
                            c_posnorm[csel] = np.sqrt(_seq_sqnorm(cm)) > 0
                        continue
                    csel = np.flatnonzero(lens == L)
                    cm = np.vstack([tvecs[i] for i in csel]).astype(
                        np.float64
                    )
                    cn = np.sqrt(_seq_sqnorm(cm))
                    c_posnorm[csel] = cn > 0
                    qsel, qm, qn = qgroups[int(L)]
                    dot = _seq_dot(cm, qm)
                    denom = cn[:, None] * qn[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sub = np.where(
                            (cn[:, None] > 0) & (qn[None, :] > 0),
                            dot / denom,
                            0.0,
                        )
                    cos[np.ix_(csel, qsel)] = sub
                # NULL class: both norms positive but lengths differ
                is_null = (
                    c_posnorm[:, None]
                    & q_posnorm[None, :]
                    & (lens[:, None] != qlens[None, :])
                )
                self_m = tids[:, None] == qids[None, :]
                valid = ~is_null & ~self_m
                # per-query preselect among valid values
                masked = np.where(valid, cos, -np.inf)
                n_valid = valid.sum(axis=0)
                kth = np.full(n_q, -np.inf)
                enough = n_valid >= k
                if enough.any() and masked.shape[0] >= k:
                    part = np.partition(masked, masked.shape[0] - k, axis=0)[
                        masked.shape[0] - k
                    ]
                    kth[enough] = part[enough]
                keep = valid & (masked >= kth[None, :] - margin)
                ii, jj = np.nonzero(keep)
                frames = [
                    pd.DataFrame(
                        {
                            "query_id": qids[jj],
                            "neighbor_id": tids[ii],
                            "_raw": cos[ii, jj],
                        }
                    )
                ]
                # NULL rows where a query's tile has < k non-null pairs
                short = np.flatnonzero(n_valid < k)
                for j in short:
                    ni = np.flatnonzero(is_null[:, j] & ~self_m[:, j])
                    if ni.size == 0:
                        continue
                    ni = ni[np.argsort(tids[ni])][:k]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    ni.size, qids[j], dtype=np.int64
                                ),
                                "neighbor_id": tids[ni],
                                "_raw": np.full(ni.size, np.nan),
                            }
                        )
                    )
                out = pd.concat(frames, ignore_index=True)
                yield out

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.when(~F.isnan(F.col("_raw")), F.col("_raw")), round_dp
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def blocked_pairs_arrow(
    corpus: DataFrame,
    threshold: float,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    salt: int = 8,
) -> DataFrame:
    """Arrow fast path of cosine_dup_pairs(block_col=...): numerically
    BIT-IDENTICAL pairs (see _seq_dot) scored by numpy inside applyInPandas
    instead of per-pair interpreted JVM expressions.

    Why not expressions: the O(pairs) cosine dominates this operator, and
    neither JVM form is fast — the HOF fold runs interpreted (~2 us/pair),
    and a fully unrolled 64-term codegen expression exceeds the JIT's huge-
    method limit, executing as raw bytecode (measured minutes). Handing each
    (block, sub-bucket) group to numpy does the same flops vectorized
    (guide §4.2). Grouping: every row enters its own sub-bucket
    xxhash64(id)%salt once as a LEFT row and every sub-bucket of its block
    as a RIGHT row, so the group (block, u) scores exactly the pairs whose
    SMALLER-id member hashes to u — each unordered pair once, and salt
    sub-splits the few-large-blocks case across the cluster (guide §2.5).

    Exactness contract (mirrors the expression semantics for EVERY input):
      * products/sums/norms/division accumulate in the identical IEEE order;
      * pairs are scored per equal-length group (zip_with pads with NULL, so
        mixed-length pairs have NULL dot -> cosine 0.0 -> never emitted;
        zero-norm or NaN/null-element vectors likewise);
      * the UDF emits RAW cosines above a conservative pre-threshold
        (threshold - 0.5*10^-dp - 1e-9, which cannot exclude any pair whose
        ROUNDED value reaches threshold); Spark's own round() then applies
        the final threshold, so rounding semantics are exactly the engine's.
    """
    spark = corpus.sparkSession
    import pandas as pd  # noqa: F811

    pre = threshold - 0.5 * 10.0 ** (-round_dp) - 1e-9
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(block_col).alias("_b"),
    )
    left = base.withColumn(
        "_u", F.pmod(F.xxhash64(F.col("_id")), F.lit(salt))
    ).withColumn("_left", F.lit(True))
    right = base.withColumn(
        "_u",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))
        ),
    ).withColumn("_left", F.lit(False))
    both = left.unionByName(right)

    out_schema = T.StructType(
        [
            T.StructField("id1", T.LongType()),
            T.StructField("id2", T.LongType()),
            T.StructField("_raw", T.DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        is_left = pdf["_left"].to_numpy()
        vecs = pdf["_v"].tolist()
        lens = np.fromiter(
            (len(v) if v is not None else -1 for v in vecs),
            dtype=np.int64,
            count=len(vecs),
        )
        lpos, rpos = np.flatnonzero(is_left), np.flatnonzero(~is_left)
        if lpos.size == 0 or rpos.size == 0:
            return pd.DataFrame({"id1": [], "id2": [], "_raw": []}).astype(
                {"id1": "int64", "id2": "int64", "_raw": "float64"}
            )
        # full group matrix starts at 0.0 — the expression's value for every
        # degenerate combination (null vector, mixed lengths, zero norm), so
        # thresholds <= 0 emit exactly the same pair set; equal-length
        # sub-blocks are scored and scattered in
        inv_l = np.full(len(vecs), -1, dtype=np.int64)
        inv_l[lpos] = np.arange(lpos.size)
        inv_r = np.full(len(vecs), -1, dtype=np.int64)
        inv_r[rpos] = np.arange(rpos.size)
        cos_full = np.zeros((lpos.size, rpos.size))
        # rows whose own norm is strictly positive (finite): pairs of such
        # rows with UNEQUAL lengths are NULL in the expression form (partial
        # zip product -> NULL dot with non-null norms) and must never be
        # emitted; every other degenerate combo evaluates to 0.0 there
        pos_norm = np.zeros(len(vecs), dtype=bool)
        for L in np.unique(lens):
            if L <= 0:
                continue
            sel = np.flatnonzero(lens == L)
            m = np.vstack([vecs[i] for i in sel]).astype(np.float64)
            n = np.sqrt(_seq_sqnorm(m))
            pos_norm[sel] = n > 0
        for L in np.unique(lens):
            if L <= 0:
                continue
            sel = lens == L
            li = np.flatnonzero(sel & is_left)
            ri = np.flatnonzero(sel & ~is_left)
            if li.size == 0 or ri.size == 0:
                continue
            lm = np.vstack([vecs[i] for i in li]).astype(np.float64)
            rm = np.vstack([vecs[i] for i in ri]).astype(np.float64)
            n1 = np.sqrt(_seq_sqnorm(lm))
            n2 = np.sqrt(_seq_sqnorm(rm))
            dot = _seq_dot(lm, rm)
            denom = n1[:, None] * n2[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(
                    (n1[:, None] > 0) & (n2[None, :] > 0), dot / denom, 0.0
                )
            cos_full[np.ix_(inv_l[li], inv_r[ri])] = cos
        lid, rid = ids[lpos], ids[rpos]
        excl = (
            pos_norm[lpos][:, None]
            & pos_norm[rpos][None, :]
            & (lens[lpos][:, None] != lens[rpos][None, :])
        )
        mask = (lid[:, None] < rid[None, :]) & (cos_full >= pre) & ~excl
        ii, jj = np.nonzero(mask)
        return pd.DataFrame(
            {"id1": lid[ii], "id2": rid[jj], "_raw": cos_full[ii, jj]}
        )

    def score_tiled(pdf: pd.DataFrame) -> pd.DataFrame:
        # Bound the per-task pair matrix (guide §5): score() materializes an
        # O(lefts x rights) float64 matrix; at a larger SF a block grows
        # linearly on BOTH axes, so the full matrix is quadratic in corpus
        # size (e.g. 2.5k x 20k doubles = 400 MB at 10x this corpus, times
        # 32 concurrent tasks). Tiling the LEFT rows caps peak memory at
        # ~tile x rights doubles per task; results are per-pair, so the
        # concatenated output is identical.
        is_left = pdf["_left"].to_numpy()
        lrows = np.flatnonzero(is_left)
        rmask = ~is_left
        TILE = _PAIR_TILE
        if lrows.size <= TILE:
            return score(pdf)
        parts = []
        for s in range(0, lrows.size, TILE):
            sel = np.zeros(len(pdf), dtype=bool)
            sel[lrows[s : s + TILE]] = True
            sel |= rmask
            parts.append(score(pdf.iloc[np.flatnonzero(sel)]))
        return pd.concat(parts, ignore_index=True)

    raw = both.groupBy("_b", "_u").applyInPandas(score_tiled, out_schema)
    return raw.select(
        "id1", "id2", F.round(F.col("_raw"), round_dp).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def make_hyperplane_udf(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    """Arrow UDF: embedding -> array of n_tables bucket signatures.
    One numpy matmul per batch (rows x dim @ dim x n_bits*n_tables)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits * n_tables)).astype(np.float32)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        bits = (m @ planes) > 0
        bits = bits.reshape(len(m), -1, n_bits)  # rows x tables x bits
        codes = (bits * weights).sum(axis=2)
        # prefix table index so different tables never collide
        codes = codes + (np.arange(codes.shape[1], dtype=np.int64) << np.int64(n_bits + 1))
        return pd.Series(list(codes))

    return buckets


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_bits: int = 12,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = ids sharing >=1 hyperplane bucket with
    the query in any table; exact cosine rerank on candidates only."""
    udf = make_hyperplane_udf(dim, n_bits, n_tables, seed)
    cb = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
        .withColumn("_cn", _norm_guarded(F.col("cvec"), dim))
        .withColumn("bucket", F.explode(udf(F.col("cvec"))))
    )
    qb = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .withColumn("_qn", _norm_guarded(F.col("qvec"), dim))
        .withColumn("bucket", F.explode(udf(F.col("qvec"))))
    )
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "_qn", "neighbor_id", "cvec", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_from_parts(
                _dot_guarded(F.col("qvec"), F.col("cvec"), dim),
                F.col("_qn"),
                F.col("_cn"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    n_lists: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int | None = None,
    iters: int = 25,
) -> np.ndarray:
    """Spherical KMeans over a deterministic corpus sample -> unit-norm
    centroid matrix (n_lists x dim), float32.

    The sample is the first `sample_n` vectors in (xxhash64(id, seed), id)
    order — seeded and CLUSTER-SIZE INDEPENDENT, so the fit (all-numpy
    Lloyd's on the driver: assign by max cosine, mean + renormalize) is
    bit-identical on any executor count. Empty lists are reseeded to the
    sample points worst-covered by the current centroids (deterministic
    argsort). At 100 TB the sample collect is one small job; the fit itself
    is O(sample_n x dim x n_lists) driver numpy — negligible next to the
    corpus assignment pass."""
    sample_n = sample_n or max(2048, 64 * n_lists)
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy(F.xxhash64(F.col("cid"), F.lit(seed)), F.col("cid"))
        .limit(sample_n)
        .collect()
    )
    x = np.vstack([np.asarray(r["cv"], dtype=np.float32) for r in rows])
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    xn = x / n[:, None]
    rng = np.random.default_rng(seed)
    cents = xn[rng.choice(len(xn), size=min(n_lists, len(xn)), replace=False)].copy()
    if len(cents) < n_lists:  # degenerate tiny corpus: pad by repetition
        cents = np.vstack([cents] * (n_lists // len(cents) + 1))[:n_lists]
    for _ in range(iters):
        cos = xn @ cents.T
        assign = np.argmax(cos, axis=1)
        new = np.zeros_like(cents)
        np.add.at(new, assign, xn)
        counts = np.bincount(assign, minlength=n_lists).astype(np.float32)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(cos.max(axis=1))[: int(empty.sum())]
            new[empty] = xn[worst]
            counts[empty] = 1.0
        new /= counts[:, None]
        nn = np.linalg.norm(new, axis=1)
        nn[nn == 0] = 1.0
        new /= nn[:, None]
        if np.allclose(new, cents, atol=1e-6):
            cents = new
            break
        cents = new
    return cents.astype(np.float32)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim_hint: int = 64,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into n_lists inverted lists keyed
    by nearest centroid; a query probes its n_probe nearest centroids and
    exact-reranks only those lists.

    Centroids come from a seeded spherical-KMeans fit over a deterministic
    corpus sample (fit_ivf_centroids) — balanced lists and higher recall than
    the earlier raw-sample centroids, still bit-reproducible at any cluster
    size. The list assignment is one Arrow-batched matmul per side; the probe
    join is a plain equi-join on list_id, so Catalyst shuffles corpus vectors
    once by list and AQE handles uneven lists.
    """
    cmat = fit_ivf_centroids(
        corpus, n_lists, seed=seed, id_col=id_col, vec_col=vec_col
    )
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0] = 1.0

    def make_assign_udf(top_n: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def assign(vecs: pd.Series) -> pd.Series:
            m = np.vstack(vecs.to_numpy()).astype(np.float32)
            vn = np.linalg.norm(m, axis=1)
            vn[vn == 0] = 1.0
            cos = (m @ cmat.T) / vn[:, None] / cnorm[None, :]
            idx = np.argsort(-cos, axis=1)[:, :top_n].astype(np.int32)
            return pd.Series(list(idx))

        return assign

    corp = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        )
        .withColumn("_cn", _norm_guarded(F.col("cvec"), dim_hint))
        .withColumn("list_id", F.element_at(make_assign_udf(1)(F.col("cvec")), 1))
    )
    qry = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        .withColumn("_qn", _norm_guarded(F.col("qvec"), dim_hint))
        .withColumn("list_id", F.explode(make_assign_udf(n_probe)(F.col("qvec"))))
    )
    scored = (
        corp.join(F.broadcast(qry), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_parts(
                    _dot_guarded(F.col("qvec"), F.col("cvec"), dim_hint),
                    F.col("_qn"),
                    F.col("_cn"),
                ),
                6,
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
