"""Deterministic corpus sampling for training-data curation.

Two operators a 100 TB pipeline needs after dedup/filtering:

* ``stratified_sample`` — keep each row with a per-stratum probability,
  decided by a CONTENT-STABLE mix of the row key. Map-only: zero shuffle,
  zero driver state, so it costs one scan at any corpus size. Unlike
  ``DataFrame.sampleBy`` (whose draw depends on partition layout and
  task-retry order), the hash draw is a pure function of the row key:
  re-running after a repartition, a resume, or on a different cluster
  selects the SAME rows — the property a checkpoint-resumable pipeline
  (pipeline.py's contract) actually requires.

* ``quota_sample`` — exactly k rows per stratum, chosen as the top-k by
  the same key mix (a uniform random permutation per stratum, fixed by the
  salt). One shuffle on the stratum key, bounded by a window top-k; the
  hash-rank ordering means partial re-runs agree on the selection.

The mixer is a multiplicative hash kept inside non-overflowing BIGINT range
((key * KNUTH_A) mod 2^31, Knuth multiplicative hashing, TAOCP vol. 3
§6.4) so a SQL oracle (DuckDB) reproduces every draw bit-for-bit — 64-bit
mixers (xxhash64/splitmix64) rely on wrapping overflow that portable SQL
cannot express. For adversarial key distributions swap in
``F.xxhash64`` via mix_col; the sampling logic is unchanged.

Reference parity: the reference pipeline has no sampling stage (it syncs
every surviving record, reference/main.py); these extend the curation
surface the way web-scale training pipelines (C4, Gopher, Dolma) subsample
their cleaned corpora.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.textstats import token_count_col

# Knuth's multiplicative constant (closest prime to 2^32/phi); the modulus
# 2^31 keeps key*A within BIGINT for any key < 2^32 and the draw uniform
# enough for rate sampling (it is a bijection of the low 31 key bits).
KNUTH_A = 2654435761
MIX_MOD = 2**31


def mix_col(key: Column, salt: int = 0) -> Column:
    """Deterministic 31-bit mix of an integer key column (plus salt).

    Pure JVM arithmetic — whole-stage codegen, and expressible verbatim in
    ANSI SQL: pmod((key + salt) * 2654435761, 2147483648).
    """
    return F.pmod(
        (key.cast("long") + F.lit(salt)) * F.lit(KNUTH_A), F.lit(MIX_MOD)
    )


def stratified_sample(
    docs: DataFrame,
    strata_cols: Sequence[str],
    fractions: Mapping[str, float] | float,
    key_col: str = "doc_id",
    salt: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff mix(key) < fraction(stratum) * 2^31.

    fractions: either one rate for every stratum, or a mapping keyed by the
    stratum value (single-column strata) with ``default_fraction`` for
    unlisted strata. Map-only — the filter composes with the parquet scan;
    no shuffle, no sort, no state.
    """
    draw = mix_col(F.col(key_col), salt)
    if isinstance(fractions, Mapping):
        if len(strata_cols) != 1:
            raise ValueError("per-stratum fractions need exactly one stratum column")
        frac: Column = F.lit(float(default_fraction))
        for value, f in sorted(fractions.items()):
            frac = F.when(
                F.col(strata_cols[0]) == F.lit(value), F.lit(float(f))
            ).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    return docs.filter(draw < (frac * F.lit(MIX_MOD)).cast("long"))


def quota_sample(
    docs: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum: the k smallest by the
    salted key mix (ties broken by the key itself, so the result is a total
    order — identical on every run). Adds ``sample_rank`` (1-based).

    One hash shuffle on the strata; rank_number's sort is per-stratum. At
    web scale a hot stratum sorts k·log via the window's partial top-k —
    bounded, but if one stratum dominates the corpus prefer
    stratified_sample (rate form, no shuffle at all).
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        mix_col(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_plan(
    docs: DataFrame,
    weights,
    budget_frac: float,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling rates realizing a target token MIXTURE under a
    token budget (Pile/DoReMi-style source reweighting): with T_s tokens in
    source s, target share w_s (sum 1) and budget B = budget_frac * sum(T),
    rate_s = min(1, B * w_s / T_s). Sources whose target share exceeds their
    holdings saturate at 1 (no upsampling — repetition is a training-loop
    decision, not a corpus transform).

    weights: a callable mapping the source Column to a weight Column (pure
    JVM arithmetic keeps the whole plan codegen'd), or a {source: weight}
    mapping. Cost: ONE partial-agg shuffle of (source, token-count) pairs —
    map-side combine collapses each partition to its distinct sources, so
    a 3-source 100 TB corpus shuffles a few rows per partition; the
    grand-total window runs over the #sources-row aggregate (single tiny
    partition, documented bound).

    Returns (source, total_tokens, weight, sample_rate) — feed to
    apply_mixture.
    """
    per = docs.groupBy(source_col).agg(
        F.sum(token_count_col(F.col(text_col))).cast("long").alias("total_tokens")
    )
    if callable(weights):
        w = weights(F.col(source_col))
    else:
        w = F.lit(0.0)
        for k, v in sorted(weights.items()):
            w = F.when(F.col(source_col) == F.lit(k), F.lit(float(v))).otherwise(w)
    grand = F.sum("total_tokens").over(Window.partitionBy())
    return per.select(
        source_col,
        "total_tokens",
        w.alias("weight"),
        F.least(
            F.lit(1.0),
            F.lit(float(budget_frac)) * grand * w / F.col("total_tokens"),
        ).alias("sample_rate"),
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
) -> DataFrame:
    """Sample docs at each source's planned rate with the content-stable
    mix draw: broadcast the #sources-row plan, filter map-side — the corpus
    never shuffles, and the selection is stable under repartition/resume
    like stratified_sample."""
    rates = F.broadcast(plan.select(source_col, "sample_rate"))
    return (
        docs.join(rates, source_col)
        .filter(
            mix_col(F.col(key_col), salt)
            < (F.col("sample_rate") * F.lit(MIX_MOD)).cast("long")
        )
        .drop("sample_rate")
    )
