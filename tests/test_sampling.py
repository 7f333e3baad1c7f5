"""Deterministic sampling (sampling.py): content-stable draws, exact
quotas, rate accuracy, and the plan contracts (rate sampling is map-only;
quota sampling shuffles once, on the strata)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.sampling import (
    KNUTH_A,
    MIX_MOD,
    mix_col,
    quota_sample,
    stratified_sample,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "es")
        .otherwise("de")
        .alias("lang"),
    )


def test_mix_matches_reference_formula(spark):
    rows = (
        spark.range(5)
        .select(F.col("id"), mix_col(F.col("id"), salt=7).alias("m"))
        .collect()
    )
    for r in rows:
        assert r.m == ((r.id + 7) * KNUTH_A) % MIX_MOD


def test_stratified_rates_and_mapping(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, ["lang"], {"en": 0.5, "es": 0.25}, salt=7, default_fraction=0.125
    )
    got = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # ~667 docs per stratum; the hash draw should land near the rate
    assert 0.40 < got["en"] / 667 < 0.60
    assert 0.17 < got["es"] / 667 < 0.33
    assert 0.06 < got["de"] / 667 < 0.19


def test_stratified_is_content_stable(spark):
    """Same rows selected regardless of partitioning — the resume/repro
    property DataFrame.sampleBy does not give."""
    d = _docs(spark, 500)
    a = {r.doc_id for r in stratified_sample(d, ["lang"], 0.3, salt=1).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            d.repartition(13, "doc_id"), ["lang"], 0.3, salt=1
        ).collect()
    }
    assert a == b and a
    # a different salt draws a different (but again stable) subset
    c = {r.doc_id for r in stratified_sample(d, ["lang"], 0.3, salt=2).collect()}
    assert c != a


def test_stratified_plan_is_map_only(spark):
    plan = _plan(stratified_sample(_docs(spark), ["lang"], 0.25, salt=0))
    assert "Exchange" not in plan and "Sort" not in plan


def test_quota_exact_k_and_stable(spark):
    d = _docs(spark, 300)  # 100 per stratum
    out = quota_sample(d, ["lang"], k=10, salt=3)
    counts = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"en": 10, "es": 10, "de": 10}
    assert out.filter(F.col("sample_rank") > 10).count() == 0
    again = quota_sample(d.repartition(7), ["lang"], k=10, salt=3)
    key = lambda df: sorted((r.lang, r.sample_rank, r.doc_id) for r in df.collect())
    assert key(out) == key(again)


def test_quota_small_stratum_keeps_all(spark):
    d = _docs(spark, 9)  # 3 per stratum < k
    out = quota_sample(d, ["lang"], k=10)
    assert out.count() == 9


def test_quota_plan_single_strata_exchange(spark):
    plan = _plan(quota_sample(_docs(spark), ["lang"], k=5))
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1 and "lang" in shuffles[0]


def _src_docs(spark):
    # 3 sources with known token totals: a=400 docs x 10 tok, b=200 x 20,
    # c=100 x 10 -> T = 4000/4000/1000, grand 9000
    rows = (
        [(i, "a", "t " * 10) for i in range(400)]
        + [(1000 + i, "b", "t " * 20) for i in range(200)]
        + [(2000 + i, "c", "t " * 10) for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_plan_rates(spark):
    from fuzzy_dedupe_pipeline_spark.sampling import apply_mixture, mixture_plan

    d = _src_docs(spark)
    plan = mixture_plan(d, {"a": 0.5, "b": 0.25, "c": 0.25}, budget_frac=0.5)
    got = {r.source: r for r in plan.collect()}
    assert got["a"].total_tokens == 4000 and got["c"].total_tokens == 1000
    # B = 4500: a -> 2250/4000, b -> 1125/4000, c -> 1125/1000 saturates
    assert abs(got["a"].sample_rate - 0.5625) < 1e-12
    assert abs(got["b"].sample_rate - 0.28125) < 1e-12
    assert got["c"].sample_rate == 1.0

    out = apply_mixture(d, plan, salt=5)
    n = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert n["c"] == 100  # saturated source keeps everything
    assert 0.40 * 400 < n["a"] < 0.72 * 400
    assert 0.17 * 200 < n["b"] < 0.40 * 200
    # selection is content-stable under repartition
    again = apply_mixture(d.repartition(11), plan, salt=5)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_apply_mixture_plan_broadcasts(spark):
    from fuzzy_dedupe_pipeline_spark.sampling import apply_mixture, mixture_plan

    d = _src_docs(spark)
    plan_df = mixture_plan(d, {"a": 0.6, "b": 0.2, "c": 0.2}, 0.5)
    p = _plan(apply_mixture(d, plan_df))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
