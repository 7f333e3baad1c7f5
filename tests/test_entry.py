"""Driver-contract smoke: entry() produces rows; every oracle key has a query;
queries run at sf0.001."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_an_oracle():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    # full coverage: SQL-expressible ops get ANSI twins; the rest get golden
    # parquets (independent implementation) or self-validating recall gates
    assert o == q


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.columns  # schema resolvable
    df.limit(5).collect()


def test_spread_guard(spark, tmp_path):
    """_spread repartitions a single-split scan to the session's parallelism
    but passes a well-split source through UNTOUCHED — the guard that keeps
    the round-robin exchange out of the at-scale plan (a 100 TB source
    arrives in thousands of splits; only the sandbox's one-row-group
    testdata needs the rebalance)."""
    n = spark.sparkContext.defaultParallelism
    # one row group -> one input partition -> spread kicks in
    single = entrymod._t(spark, "/root/testdata/sf0.001", "documents")
    assert single.rdd.getNumPartitions() == 1
    assert entrymod._spread(single).rdd.getNumPartitions() == n
    # already well-split -> identity (same plan object, no exchange added)
    wide = single.repartition(n)
    spread = entrymod._spread(wide)
    assert spread is wide


def test_spread_queries_parallelize_scan_side(spark):
    """The heavy per-row queries must evaluate their expensive projection
    ABOVE the round-robin exchange (parallel), not below it (single-core):
    the executed plan shows Exchange RoundRobinPartitioning between the
    FileScan and the per-row work."""
    df = entrymod.queries()["gopher_repetition"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
    scan_pos = plan.index("FileScan")
    rr_pos = plan.index("RoundRobinPartitioning")
    # the per-row work is the Arrow gopher-stats UDF since r6 (the SQL-HOF
    # path's marker was "aggregate("); same invariant — eval node above the
    # exchange, exchange above the scan
    work_pos = plan.index("ArrowEvalPython")
    # plan prints top-down: work above the exchange, exchange above the scan
    assert work_pos < rr_pos < scan_pos
