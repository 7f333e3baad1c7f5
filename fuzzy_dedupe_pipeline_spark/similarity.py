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
