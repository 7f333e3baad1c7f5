"""Sequence packing (packing.py): concat-chunk layout vs a scalar
reimplementation, FFD invariants + determinism + content stability, and the
plan contract (one shuffle per packer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.packing import (
    pack_concat_chunks,
    pack_first_fit,
    packing_stats,
)
from fuzzy_dedupe_pipeline_spark.sampling import KNUTH_A, MIX_MOD


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=200):
    """Deterministic variable-length texts: doc i has (5 + i % 97) tokens."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.lit(5) + F.col("id") % 97).cast("int")),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
        ).alias("text"),
    )


def _scalar_chunks(rows, capacity, n_groups, salt=0):
    """Independent scalar reimplementation of concat-then-chunk."""
    mixed = [
        (((doc_id + salt) * KNUTH_A) % MIX_MOD, doc_id, ntok)
        for doc_id, ntok in rows
    ]
    out = {}
    starts = {}
    for mx, doc_id, ntok in sorted(mixed):
        g = mx % n_groups
        s = starts.get(g, 0)
        first = s // capacity
        last = max(first, (s + ntok - 1) // capacity)
        out[doc_id] = (g, ntok, s, first, last)
        starts[g] = s + ntok
    return out


def test_concat_chunks_matches_scalar(spark):
    docs = _docs(spark, 200)
    rows = [
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("n")
        ).collect()
    ]
    want = _scalar_chunks(rows, capacity=64, n_groups=4)
    got = pack_concat_chunks(docs, capacity=64, n_groups=4).collect()
    assert len(got) == len(want)
    for r in got:
        g, ntok, s, first, last = want[r.doc_id]
        assert (r.pack_group, r.n_tokens, r.tok_start) == (g, ntok, s)
        assert (r.bin_first, r.bin_last) == (first, last)


def test_concat_chunks_conservation_and_contiguity(spark):
    docs = _docs(spark, 300)
    out = pack_concat_chunks(docs, capacity=128, n_groups=8).toPandas()
    # token conservation per group: streams are gapless, so max(tok_start +
    # n_tokens) == sum(n_tokens) within each group
    out["end"] = out.tok_start + out.n_tokens
    g = out.groupby("pack_group").agg(
        max_end=("end", "max"), total=("n_tokens", "sum")
    )
    assert (g.max_end == g.total).all()
    # spans are consistent with the bins
    assert (out.bin_first == out.tok_start // 128).all()
    assert (out.bin_last >= out.bin_first).all()


def test_concat_chunks_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "d e")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in pack_concat_chunks(docs, 4, 1).collect()}
    assert out[1].n_tokens == 0
    assert out[1].bin_first == out[1].bin_last  # occupies no positions


def test_concat_chunks_one_shuffle(spark):
    plan = _plan(pack_concat_chunks(_docs(spark), 128, 8))
    assert plan.count("Exchange") == 1  # the window's hash partitioning


def test_ffd_invariants(spark):
    docs = _docs(spark, 300)
    cap = 128
    packed = pack_first_fit(docs, capacity=cap, n_groups=4)
    pdf = packed.toPandas()
    assert len(pdf) == 300 and pdf.doc_id.nunique() == 300
    assert not pdf.overflow.any()  # max doc is 101 tokens < cap
    bins = pdf.groupby(["pack_group", "bin_id"]).n_tokens.sum()
    assert (bins <= cap).all()
    # FFD guarantee: at most one bin at most half full per group
    half = bins[bins * 2 <= cap]
    if len(half):
        assert half.groupby("pack_group").size().max() <= 1
    st = packing_stats(packed, cap).collect()[0]
    assert st.n_docs == 300
    assert st.total_tokens == pdf.n_tokens.sum()
    assert st.max_bin_tokens <= cap
    assert st.fill_factor >= 0.5


def test_ffd_overflow_isolated(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["x"] * 50)), (1, "a b"), (2, "c d e")],
        "doc_id long, text string",
    )
    pdf = pack_first_fit(docs, capacity=10, n_groups=1).toPandas()
    big = pdf[pdf.doc_id == 0].iloc[0]
    assert bool(big.overflow)
    # nothing shares the overflow bin
    assert (pdf.bin_id == big.bin_id).sum() == 1
    st = packing_stats(
        pack_first_fit(docs, capacity=10, n_groups=1), 10
    ).collect()[0]
    assert st.max_bin_tokens <= 10  # overflow bins excluded from the max


def test_ffd_deterministic_and_content_stable(spark):
    docs = _docs(spark, 150)
    a = sorted(
        map(tuple, pack_first_fit(docs, 128, 4).collect())
    )
    b = sorted(
        map(tuple, pack_first_fit(docs.repartition(13), 128, 4).collect())
    )
    assert a == b  # same assignment regardless of partition layout


def test_ffd_single_shuffle(spark):
    plan = _plan(pack_first_fit(_docs(spark), 128, 8))
    assert plan.count("Exchange") == 1  # the applyInPandas group shuffle
