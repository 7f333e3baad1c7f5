"""Sketch-based corpus statistics — mergeable-state counting for 100 TB.

Exact ``COUNT(DISTINCT v)`` shuffles every distinct value to its reducer;
on a web corpus the distinct set IS the corpus (urls, normalized texts), so
that shuffle is O(corpus). The scalable primitive is a mergeable
constant-size sketch: HyperLogLog++ registers partial-aggregate map-side
(one ~kB state per partition x group), the shuffle moves sketches instead
of values, and merge is register-wise max — associative, commutative and
order-insensitive, which makes the estimate DETERMINISTIC for a given input
set (what lets an accuracy gate be a stable correctness row rather than a
flaky tolerance). Spark exposes the sketch as ``approx_count_distinct``;
``distinct_stats`` wraps it beside its exact twin so the driver oracle can
value-check the exact columns and gate the sketch's relative error
in-engine (the exact twin is the expensive side — a production run at scale
drops it and keeps only the sketch column).

Reference parity: the reference is a single-process script with no corpus
stats stage (reference/main.py syncs every surviving record); this extends
the curation surface the way web-scale pipelines report corpus/dedup
cardinalities without paying a second corpus-wide value shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rel_err_ok_col(exact: Column, approx: Column, tol: float) -> Column:
    """|approx - exact| / exact <= tol (exact = 0 passes only if approx = 0).

    HLL++ at relative standard deviation rsd keeps |err| <= 3*rsd with
    ~99.7% probability; since the estimate is deterministic per input set,
    a measured pass at a given corpus is a stable gate, not a coin flip.
    """
    return F.when(exact == 0, approx == 0).otherwise(
        F.abs(approx - exact) / exact <= F.lit(float(tol))
    )


def distinct_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group row counts + distinct-value cardinality, sketched.

    Returns (group_cols..., n_rows, approx_distinct[, exact_distinct]).
    ``with_exact`` adds the exact COUNT(DISTINCT) twin — the O(distinct
    values) shuffle kept for gating/testing; the 100 TB form runs with
    ``with_exact=False`` and ships only HLL register states through the
    exchange (partial_approx_count_distinct map-side, plan-asserted in
    tests/test_sketches.py).
    """
    aggs = [
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(value_col, float(rsd)).alias("approx_distinct"),
    ]
    if with_exact:
        aggs.append(F.countDistinct(value_col).alias("exact_distinct"))
    return df.groupBy(*group_cols).agg(*aggs)
