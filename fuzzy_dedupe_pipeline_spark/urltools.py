"""URL canonicalization + URL-tier dedup for Common-Crawl-style pages.

Tier 0 of the dedup cascade: before any text ever gets tokenized, collapse
rows that are the *same resource* crawled more than once — recrawls, scheme /
case / default-port / tracking-param / trailing-slash variants of one URL.
At 10^12 crawl records this is the cheapest tier by far (one groupBy on a
short string key, no text touched) and it shrinks every downstream stage.

Everything here is pure JVM column expressions (whole-stage codegen; never a
Python UDF) built from regexes simple enough that Java regex and DuckDB's RE2
agree token-for-token — that is what makes the `url_canonical_dedup` oracle
row in __spark_entry__ an exact value-level parity check.

Canonical form (the dedup key — not a fetchable URL):
  * scheme dropped (http/https variants of one resource are one resource)
  * host lowercased, leading "www." and trailing "." stripped
  * default ports 80/443 dropped, other ports kept
  * path: duplicate slashes collapsed, trailing "/" stripped ("" stays "")
  * fragment dropped
  * query: tracking params removed (utm_*, fbclid, gclid, msclkid, mc_eid,
    igshid, ref), empty params removed, the rest byte-sorted and rejoined

The reference dedupes spreadsheet contact rows and has no URL concept; this
tier exists because the north-rule input is a crawl table keyed by url
(pages(url, warc_ts, html, text, lang)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# params that identify a campaign, not a resource
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

# RE2-safe building blocks (no backrefs, no lookarounds). The optional
# scheme makes protocol-relative URLs ("//host/path") canonicalize to the
# same key as their absolute forms instead of leaking the host into the path.
_SCHEME_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//"


def _strip_scheme(c: Column) -> Column:
    return F.regexp_replace(c, _SCHEME_RE, "")


def canonical_url_col(c: Column) -> Column:
    """Canonical dedup key for a URL column. NULL-safe (NULL -> NULL)."""
    u = F.regexp_replace(_strip_scheme(c), r"#.*$", "")  # drop fragment
    hostport_raw = F.lower(F.regexp_extract(u, r"^([^/?]*)", 1))
    rest = F.substring(u, F.length(hostport_raw) + 1, F.lit(2147483647))
    # userinfo ('user:pw@host') identifies a session, not a resource; the
    # hostport extraction stops at / and ?, so an '@' here is always userinfo
    # (stripped AFTER `rest` is carved off the raw length)
    hostport = F.regexp_replace(hostport_raw, r"^[^@]*@", "")
    # host: lowercase, strip www. and trailing dot; drop default ports only
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")
    keep_port = (port != "") & (port != "80") & (port != "443")
    hostc = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    # path: collapse //+, strip trailing slash
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    # query: split, drop tracking + empties, sort, rejoin
    q = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    qc = F.concat_ws("&", kept)
    canon = F.concat(
        hostc,
        path,
        F.when(qc != "", F.concat(F.lit("?"), qc)).otherwise(F.lit("")),
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(canon)


def with_canonical_url(
    pages: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return pages.withColumn(out_col, canonical_url_col(F.col(url_col)))


def url_tier_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Keep ONE row per canonical URL: the latest crawl (max ts), ties broken
    by min original url — deterministic under recrawl storms. A pages table
    without the timestamp column is supported (ties broken by url alone),
    and NULL-url rows pass through untouched: they have no dedup key, so
    collapsing them into one NULL group would both drop data and funnel
    every keyless row into a single hot window partition.

    One shuffle on the canonical key (short string), arg-max via window over
    that same partitioning — no second shuffle. At crawl scale the key is
    near-unique so AQE keeps partitions balanced; a hot canonical URL (a page
    recrawled millions of times) is bounded by the crawler's politeness rate,
    not by corpus size, so no salt is needed on this tier.
    """
    d = with_canonical_url(pages, url_col)
    keyless = d.filter(F.col("canonical_url").isNull())
    order = [F.col(url_col).asc()]
    if ts_col in pages.columns:
        order.insert(0, F.col(ts_col).desc())
    w = Window.partitionBy("canonical_url").orderBy(*order)
    return (
        d.filter(F.col("canonical_url").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .unionByName(keyless)
    )


def url_dup_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-canonical-URL crawl multiplicity: rep (min url) + n_crawls.
    The funnel metric for tier 0 (how much the URL tier removed)."""
    return (
        with_canonical_url(pages, url_col)
        .groupBy("canonical_url")
        .agg(
            F.min(url_col).alias("rep_url"),
            F.count("*").cast("long").alias("n_crawls"),
        )
    )


def host_col(url: Column) -> Column:
    """RAW host of a URL for blocklist matching: scheme + userinfo stripped,
    lowercased, port and trailing dot removed — but the subdomain labels
    KEPT (unlike the canonical form's www.-strip): blocklists match by
    domain SUFFIX, so the chain must see every label. NULL-safe."""
    u = _strip_scheme(url)
    hostport = F.lower(F.regexp_extract(u, r"^([^/?]*)", 1))
    hostport = F.regexp_replace(hostport, r"^[^@]*@", "")
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    return F.regexp_replace(host, r"\.$", "")


def host_suffixes_col(host: Column) -> Column:
    """Dot-suffix chain of a host: 'a.b.example.com' ->
    ['a.b.example.com', 'b.example.com', 'example.com', 'com'] — a
    blocklist entry 'example.com' thereby blocks every subdomain, the UT1 /
    RefinedWeb matching rule. Pure JVM higher-order functions (split +
    transform + slice): whole-stage codegen, no Python."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def with_blocklist_flag(
    pages: DataFrame,
    blocked,
    url_col: str = "url",
    id_col: str | None = None,
) -> DataFrame:
    """Adds (host, blocked): blocked = any dot-suffix of the host appears in
    the blocklist — the domain-blocklist filter (UT1 adult/malware lists in
    RefinedWeb; Dolma's domain blocks) a crawl pipeline applies before
    spending any compute on a page's text. Filter `~blocked` downstream.

    Two forms by blocklist size:
      * blocked: Sequence[str] — a literal array probed with arrays_overlap:
        map-only, ZERO shuffle, fine for config-sized lists.
      * blocked: DataFrame['domain'] — UT1-scale lists (millions of
        domains): the suffix chain explodes map-side into a LEFT SEMI
        broadcast hash probe (the corpus never shuffles — decontam.py's
        join shape), hit ids distinct (O(blocked docs) only) and broadcast
        back as the flag join. Requires ``id_col`` (a unique row key).

    The reference has no URL concept (it dedups contact rows,
    reference/dedupe_logic/processor.py); this tier exists for the
    north-rule crawl-table input.
    """
    d = pages.withColumn("host", host_col(F.col(url_col)))
    sufs = host_suffixes_col(F.col("host"))
    if isinstance(blocked, DataFrame):
        if id_col is None:
            raise ValueError("DataFrame blocklist needs id_col (unique row key)")
        bl = F.broadcast(
            blocked.select(F.lower(F.col("domain")).alias("suffix")).distinct()
        )
        hits = (
            d.select(id_col, F.explode_outer(sufs).alias("suffix"))
            .filter(F.col("suffix").isNotNull())
            .join(bl, "suffix", "left_semi")
            .select(id_col)
            .distinct()
        )
        return d.join(
            F.broadcast(hits.withColumn("blocked", F.lit(True))),
            id_col,
            "left",
        ).withColumn("blocked", F.coalesce("blocked", F.lit(False)))
    arr = F.array(*[F.lit(b.lower()) for b in sorted(set(blocked))])
    return d.withColumn(
        "blocked", F.coalesce(F.arrays_overlap(sufs, arr), F.lit(False))
    )


def domain_col(canon: Column) -> Column:
    """Host part of a canonical URL (everything before the first '/', '?' or
    ':'). On the canonical form this is already lowercased, www.-stripped and
    default-port-free, so it groups every variant of one site together."""
    return F.regexp_extract(canon, r"^([^/:?]*)", 1)


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain crawl/dup rollup — the template-farm detector.

    For each domain: crawl multiplicity (n_crawls vs n_resources = distinct
    canonical URLs) and content diversity (n_unique_texts vs n_resources).
    A domain whose thousands of resources collapse to a handful of unique
    texts is a mirror or a template farm; curation pipelines cap or drop such
    domains before any per-document scoring spends compute on them.

    ONE aggregation shuffle keyed on the short domain string. The two exact
    COUNT(DISTINCT)s expand rows 3x through the exchange — kept exact here
    because the driver oracle value-checks them; the 10^12-row form swaps
    them for the HLL sketches in sketches.distinct_stats (same group key,
    constant-size state). Domain keys are power-law-hot but bounded by
    politeness-rate crawling, and partial aggregation collapses each map
    task's contribution to one row per (domain, distinct value) before the
    shuffle. Ratios are exact-int-division -> double, rounded to 6dp (the
    oracle-parity float discipline).
    """
    d = with_canonical_url(pages, url_col)
    agg = d.groupBy(domain_col(F.col("canonical_url")).alias("domain")).agg(
        F.count("*").cast("long").alias("n_crawls"),
        F.countDistinct("canonical_url").cast("long").alias("n_resources"),
        F.countDistinct(text_col).cast("long").alias("n_unique_texts"),
    )
    return agg.select(
        "domain",
        "n_crawls",
        "n_resources",
        "n_unique_texts",
        F.round(
            F.lit(1.0) - F.col("n_resources").cast("double") / F.col("n_crawls"),
            6,
        ).alias("crawl_dup_rate"),
        F.round(
            F.lit(1.0)
            - F.col("n_unique_texts").cast("double") / F.col("n_resources"),
            6,
        ).alias("text_dup_rate"),
    )
