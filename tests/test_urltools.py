"""URL canonicalization + tier-0 URL dedup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.urltools import (
    canonical_url_col,
    url_dup_stats,
    url_tier_dedup,
)


def _canon(spark, urls: list[str | None]) -> list[str | None]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    return [r.c for r in rows]


def test_canonical_variants_collapse(spark):
    variants = [
        "https://example.com/a/b?a=1&b=2",
        "HTTP://WWW.Example.COM:80//a//b/?utm_source=tw&b=2&a=1#frag",
        "https://example.com.:443/a/b/?fbclid=zz&a=1&b=2&",
        "http://www.EXAMPLE.com/a///b?b=2&a=1",
    ]
    assert set(_canon(spark, variants)) == {"example.com/a/b?a=1&b=2"}


def test_canonical_preserves_distinctions(spark):
    # non-default port, different path, different param VALUE, extra param:
    # all must stay distinct resources
    urls = [
        "https://example.com:8080/a/b?a=1&b=2",
        "https://example.com/a/c?a=1&b=2",
        "https://example.com/a/b?a=1&b=3",
        "https://example.com/a/b?a=1&b=2&c=3",
        "https://other.com/a/b?a=1&b=2",
    ]
    got = _canon(spark, urls)
    assert len(set(got)) == len(urls)
    assert got[0] == "example.com:8080/a/b?a=1&b=2"


def test_canonical_edges(spark):
    assert _canon(
        spark,
        [None, "https://example.com", "https://example.com/?ref=x", "example.com/x"],
    ) == [None, "example.com", "example.com", "example.com/x"]


def test_canonical_strips_userinfo(spark):
    # credentials/usernames identify a session, not a resource; an '@' in a
    # path or query must NOT be treated as userinfo
    assert _canon(
        spark,
        [
            "https://user:pw@example.com/a/b",
            "https://example.com/a/b",
            "https://example.com/path@v2?a=x@y.z",
        ],
    ) == ["example.com/a/b", "example.com/a/b", "example.com/path@v2?a=x@y.z"]


def test_url_tier_dedup_keeps_latest_crawl(spark):
    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 2, 1)
    rows = [
        ("https://a.com/p?utm_source=x", t0, "old"),
        ("https://A.com/p", t1, "new"),
        ("https://a.com/p", t1, "new-tie"),  # same ts: min url wins
        ("https://b.com/q", t0, "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = url_tier_dedup(df).orderBy("canonical_url").collect()
    assert [(r.canonical_url, r.text) for r in out] == [
        ("a.com/p", "new"),  # t1 beats t0; 'https://A.com/p' < 'https://a.com/p'
        ("b.com/q", "only"),
    ]
    stats = {
        r.canonical_url: r.n_crawls for r in url_dup_stats(df).collect()
    }
    assert stats == {"a.com/p": 3, "b.com/q": 1}


def test_url_tier_single_shuffle(spark):
    # the window argmax must reuse the groupBy partitioning: exactly one
    # Exchange in the whole tier
    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("https://a.com/p", t0, "x")], "url string, warc_ts timestamp, text string"
    )
    plan = url_tier_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_protocol_relative_collapses_with_absolute(spark):
    # a scheme-relative crawl record of the same resource must share the
    # absolute form's canonical key (host must not leak into the path)
    assert set(
        _canon(
            spark,
            [
                "//example.com/a/b",
                "//WWW.Example.COM:443//a//b/",
                "https://example.com/a/b",
            ],
        )
    ) == {"example.com/a/b"}


def test_url_tier_without_timestamp_column(spark):
    # crawl tables without warc_ts are supported by the rest of the pipeline;
    # the URL tier must not hard-require the column (ties break on url alone)
    df = spark.createDataFrame(
        [
            ("https://a.com/p?utm_source=x", "drop"),
            ("https://A.com/p", "keep"),  # min url wins without a ts
            ("https://b.com/q", "only"),
        ],
        "url string, text string",
    )
    out = url_tier_dedup(df).orderBy("canonical_url").collect()
    assert [(r.canonical_url, r.text) for r in out] == [
        ("a.com/p", "keep"),
        ("b.com/q", "only"),
    ]


def test_url_tier_null_urls_pass_through(spark):
    # NULL urls have no dedup key: every row must survive (collapsing the
    # NULL group would silently drop data)
    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            (None, t0, "n1"),
            (None, t0, "n2"),
            ("https://a.com/p", t0, "a"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    out = url_tier_dedup(df).collect()
    assert sorted(r.text for r in out) == ["a", "n1", "n2"]


def test_domain_stats_rollup(spark):
    from fuzzy_dedupe_pipeline_spark.urltools import domain_stats

    rows = [
        # farm.com: 4 crawls -> 2 resources -> 1 unique text (template farm)
        ("https://farm.com/p/1", "T"),
        ("HTTP://WWW.Farm.COM/p/1#x", "T"),
        ("https://farm.com/p/2", "T"),
        ("https://farm.com.:443/p/2?utm_source=z", "T"),
        # good.org: 2 crawls -> 2 resources -> 2 unique texts
        ("https://good.org/a", "A"),
        ("https://good.org/b", "B"),
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    got = {r.domain: r for r in domain_stats(df).collect()}
    assert set(got) == {"farm.com", "good.org"}
    f = got["farm.com"]
    assert (f.n_crawls, f.n_resources, f.n_unique_texts) == (4, 2, 1)
    assert abs(f.crawl_dup_rate - 0.5) < 1e-9
    assert abs(f.text_dup_rate - 0.5) < 1e-9
    g = got["good.org"]
    assert (g.n_crawls, g.n_resources, g.n_unique_texts) == (2, 2, 2)
    assert g.crawl_dup_rate == 0.0 and g.text_dup_rate == 0.0


def test_domain_stats_single_shuffle(spark):
    from fuzzy_dedupe_pipeline_spark.urltools import domain_stats

    df = spark.createDataFrame(
        [("https://a.com/x", "t1"), ("https://b.com/y", "t2")], ["url", "text"]
    )
    plan = domain_stats(df)._jdf.queryExecution().executedPlan().toString()
    # one aggregation exchange (plus the expand for the two exact distincts);
    # no join, no cartesian
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


# -- domain blocklist ---------------------------------------------------------

from fuzzy_dedupe_pipeline_spark.urltools import (  # noqa: E402
    host_col,
    host_suffixes_col,
    with_blocklist_flag,
)

_BL_URLS = [
    (1, "https://www.Bad.COM/x"),          # subdomain of a blocked domain
    (2, "http://deep.a.bad.com.:8080/y"),  # deeper subdomain, port + dot
    (3, "https://user:pw@bad.com/z"),      # userinfo, exact domain
    (4, "https://goodbad.com/x"),          # SUFFIX of the name, NOT a label
    (5, "https://bad.com.evil.org/x"),     # blocked name as non-terminal label
    (6, "https://fine.org/x"),
    (7, None),
]


def _bl_flags(spark, blocked):
    df = spark.createDataFrame(_BL_URLS, "doc_id long, url string")
    out = with_blocklist_flag(df, blocked, id_col="doc_id")
    return {r.doc_id: r.blocked for r in out.collect()}


def test_blocklist_suffix_matching_literal_and_df(spark):
    # bad.com blocks itself and every subdomain; goodbad.com must NOT match
    # (suffix chain is label-aligned), and bad.com.evil.org must NOT match
    # (bad.com is not a dot-suffix there)
    want = {1: True, 2: True, 3: True, 4: False, 5: False, 6: False, 7: False}
    assert _bl_flags(spark, ["bad.com"]) == want
    bl_df = spark.createDataFrame([("BAD.com",)], "domain string")
    assert _bl_flags(spark, bl_df) == want


def test_blocklist_df_form_requires_id(spark):
    df = spark.createDataFrame(_BL_URLS, "doc_id long, url string")
    bl_df = spark.createDataFrame([("bad.com",)], "domain string")
    import pytest

    with pytest.raises(ValueError):
        with_blocklist_flag(df, bl_df)


def test_host_and_suffix_chain(spark):
    df = spark.createDataFrame(
        [("HTTPS://u@A.B.Example.COM.:443//p?q=1#f",)], "url string"
    )
    row = df.select(
        host_col(F.col("url")).alias("h"),
        host_suffixes_col(host_col(F.col("url"))).alias("s"),
    ).collect()[0]
    assert row.h == "a.b.example.com"
    assert row.s == ["a.b.example.com", "b.example.com", "example.com", "com"]
