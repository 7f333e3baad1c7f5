"""ANN: brute-force exactness vs numpy; LSH recall vs brute force."""

from __future__ import annotations

import numpy as np

from fuzzy_dedupe_pipeline_spark.similarity import brute_force_topk, lsh_ann_topk

DIM = 16


def _emb_df(spark, n=120, seed=9):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def _numpy_topk(vecs, qids, k):
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    out = {}
    for q in qids:
        cos = norms @ norms[q]
        cos[q] = -np.inf
        order = np.lexsort((np.arange(len(cos)), -np.round(cos, 6)))
        out[q] = list(order[:k])
    return out


def test_brute_force_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    qids = [0, 7, 33]
    q = df.filter(df.vec_id.isin(qids))
    got = brute_force_topk(df, q, k=5).collect()
    want = _numpy_topk(vecs, qids, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid in qids:
        ordered = [n for _, n in sorted(by_q[qid])]
        assert ordered == want[qid], (qid, ordered, want[qid])


def test_lsh_ann_recall(spark):
    df, vecs = _emb_df(spark, n=200, seed=11)
    qids = list(range(0, 200, 40))
    q = df.filter(df.vec_id.isin(qids))
    exact = brute_force_topk(df, q, k=5).collect()
    # random Gaussian corpus -> top neighbors sit near cos ~0.6; collision
    # prob per table (1 - theta/pi)^bits => 4 bits x 16 tables gives ~0.99
    approx = lsh_ann_topk(df, q, k=5, dim=DIM, n_bits=4, n_tables=16).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, recall


def test_lsh_deterministic(spark):
    df, _ = _emb_df(spark)
    q = df.filter(df.vec_id < 3)
    a = sorted(map(tuple, lsh_ann_topk(df, q, k=3, dim=DIM).collect()))
    b = sorted(map(tuple, lsh_ann_topk(df, q, k=3, dim=DIM).collect()))
    assert a == b


def test_ivf_topk_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from fuzzy_dedupe_pipeline_spark.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4)

    want = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    # probing half the lists on clustered data; KMeans-sample centroids
    # (fit_ivf_centroids) raised the guaranteed floor from 0.5; the path is
    # deterministic — measured exactly 0.78 on this corpus/query set — so
    # the floor is 0.75 (round-5 tightening, 0.03 guard)
    assert recall >= 0.75, recall

    again = {(r["query_id"], r["neighbor_id"])
             for r in ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4).collect()}
    assert got == again


def test_cosine_dup_pairs_blocked_path(spark):
    """The scale path: block_col restricts the pair join to equi-blocks —
    the plan must be a shuffle/broadcast HASH or SORT-MERGE join (never a
    nested loop over the corpus), and results within blocks must equal the
    all-pairs baseline filtered to same-block pairs."""
    from fuzzy_dedupe_pipeline_spark.similarity import cosine_dup_pairs
    import pyspark.sql.functions as F

    df, _ = _emb_df(spark, n=80)
    blocked_df = df.withColumn("blk", (F.col("vec_id") % 4).cast("int"))
    blocked = cosine_dup_pairs(blocked_df, threshold=0.2, block_col="blk")
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )

    all_pairs = cosine_dup_pairs(df, threshold=0.2).collect()
    blk = {r.vec_id: r.vec_id % 4 for r in df.collect()}
    want = {
        (r.id1, r.id2, r.cosine) for r in all_pairs if blk[r.id1] == blk[r.id2]
    }
    got = {(r.id1, r.id2, r.cosine) for r in blocked.collect()}
    assert got == want and len(got) > 0


def test_blocked_pairs_arrow_matches_expression(spark):
    """r6 focused test: the Arrow blocked-pair scorer must match the
    expression path EXACTLY (ids and rounded cosines) — including null
    vectors, zero vectors, mixed lengths, and null elements."""
    import numpy as np

    from fuzzy_dedupe_pipeline_spark.similarity import (
        blocked_pairs_arrow,
        cosine_dup_pairs,
    )

    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
        rows.append((i, vec, int(i % 3)))
    rows += [
        (1000, None, 0),                      # null vector
        (1001, [0.0] * 64, 0),                # zero norm
        (1002, [1.0] * 32, 1),                # short vector
        (1003, [1.0] * 32, 1),                # equal-length partner
        (1004, [1.0, None] + [1.0] * 62, 2),  # null element
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    for thr in (0.0, 0.1):
        want = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in cosine_dup_pairs(
                df, threshold=thr, round_dp=4, block_col="label"
            ).collect()
        }
        got = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in blocked_pairs_arrow(
                df, threshold=thr, block_col="label", round_dp=4, salt=4
            ).collect()
        }
        assert got == want, (
            len(got),
            len(want),
            dict(list((set(got.items()) ^ set(want.items())))[:5] if got != want else {}),
        )
    # short equal-length pair must appear via the fold semantics in BOTH
    w = cosine_dup_pairs(df, threshold=0.9, round_dp=4, block_col="label")
    g = blocked_pairs_arrow(df, threshold=0.9, block_col="label", salt=2)
    wp = {(r["id1"], r["id2"]) for r in w.collect()}
    gp = {(r["id1"], r["id2"]) for r in g.collect()}
    assert (1002, 1003) in wp and wp == gp


def test_blocked_pairs_arrow_tiling(spark, monkeypatch):
    """The left-row tiling (memory bound for large blocks) must not change
    the pair set or scores."""
    import numpy as np

    import fuzzy_dedupe_pipeline_spark.similarity as sim

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16).astype("float32")], 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    want = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in sim.blocked_pairs_arrow(
            df, threshold=0.2, block_col="label", salt=1
        ).collect()
    }
    monkeypatch.setattr(sim, "_PAIR_TILE", 16)
    got = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in sim.blocked_pairs_arrow(
            df, threshold=0.2, block_col="label", salt=1
        ).collect()
    }
    assert want and got == want


def test_brute_force_topk_arrow_matches_expression(spark):
    """r6 focused test: the Arrow brute-force top-k must match the
    expression form exactly — ids, ranks, rounded cosines — including null
    vectors, zero norms, mixed lengths (NULL cosine, NULLS LAST) and
    rounding-boundary ties."""
    import numpy as np

    from fuzzy_dedupe_pipeline_spark.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(250):
        vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
        rows.append((i, vec))
    rows += [
        (1000, None),
        (1001, [0.0] * 64),
        (1002, [1.0] * 32),
        (1003, [1.0] * 32),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter((df.vec_id % 40 == 0))
    for dp in (4, 6):
        want = sorted(
            tuple(r) for r in brute_force_topk(
                df, queries, k=5, round_dp=dp
            ).collect()
        )
        got = sorted(
            tuple(r) for r in brute_force_topk_arrow(
                df, queries, k=5, round_dp=dp
            ).collect()
        )
        assert got == want, (dp, got[:8], want[:8])
    # tiny corpus: fewer rows than k -> NULL cosines must fill ranks
    small = spark.createDataFrame(rows[:2] + rows[-4:], "vec_id long, embedding array<float>")
    q2 = small.filter(small.vec_id == 0)
    want = sorted(tuple(r) for r in brute_force_topk(small, q2, k=5, round_dp=4).collect())
    got = sorted(tuple(r) for r in brute_force_topk_arrow(small, q2, k=5, round_dp=4).collect())
    assert got == want, (got, want)
