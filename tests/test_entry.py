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
