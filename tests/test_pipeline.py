"""End-to-end: recall >= 0.99 vs the reference-semantics oracle (the
BASELINE.json gate), substring family capture, boilerplate non-merge,
checkpoint-resume, metrics/lineage."""

from __future__ import annotations

import shutil

import pytest

from fuzzy_dedupe_pipeline_spark import oracle
from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.pipeline import DedupePipeline


@pytest.fixture(scope="module")
def run(spark, pages_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    shutil.rmtree(out, ignore_errors=True)
    p = DedupePipeline(spark, out, DedupeConfig(), run_id="t1")
    clusters = p.run(pages_df).toPandas()
    return p, clusters, out


def _co_membership(clusters):
    m = clusters[["url", "cluster_id"]]
    co = m.merge(m, on="cluster_id")
    co = co[co.url_x < co.url_y]
    return co.rename(columns={"url_x": "url1", "url_y": "url2"})


def test_recall_ge_099(run, corpus):
    _, clusters, _ = run
    expected = oracle.true_pairs(corpus.pages, corpus.truth)
    co = _co_membership(clusters)
    rec = oracle.pair_recall(co, expected)
    assert rec >= 0.99, f"dup-pair recall {rec} < 0.99 ({len(expected)} true pairs)"


def test_substring_family_clustered(run, corpus):
    """Planted >=60-token-run containment dups must merge with their source
    (the suffix-array-substitute pass), even when global Jaccard < 0.8."""
    _, clusters, _ = run
    truth = corpus.truth
    cl = clusters.set_index("url").cluster_id
    subs = truth[truth.kind == "substring"]
    merged = 0
    for _, row in subs.iterrows():
        fam = truth[(truth.family_id == row.family_id) & (truth.url != row.url)]
        if any(cl[row.url] == cl[u] for u in fam.url):
            merged += 1
    assert merged / max(len(subs), 1) >= 0.95, f"{merged}/{len(subs)}"


def test_boilerplate_not_merged(run, corpus):
    _, clusters, _ = run
    boiler = set(corpus.truth[corpus.truth.kind == "boiler"].url)
    sizes = clusters[clusters.url.isin(boiler)].duplicate_count
    assert (sizes == 1).all()


def test_exact_family_same_cluster(run, corpus):
    _, clusters, _ = run
    df = corpus.truth[corpus.truth.kind.isin(["exact", "exact_src"])]
    cl = clusters.set_index("url").cluster_id
    for fid, grp in df.groupby("family_id"):
        labels = {cl[u] for u in grp.url}
        assert len(labels) == 1, f"family {fid} split into {labels}"


def test_output_shape(run):
    _, clusters, _ = run
    assert list(clusters.columns) == [
        "url",
        "cluster_id",
        "confidence_score",
        "duplicate_count",
        "is_representative",
    ]
    # one representative per cluster
    reps = clusters[clusters.is_representative]
    assert reps.cluster_id.is_unique
    assert set(reps.cluster_id) == set(clusters.cluster_id)
    # singleton confidence defaults to 1.0 (processor.py:252)
    singles = clusters[clusters.duplicate_count == 1]
    assert (singles.confidence_score == 1.0).all()


def test_url_tier_collapses_recrawls(run, spark, pages_df, tmp_path_factory):
    """Tier 0 end-to-end: the corpus plus a stale recrawl of every page
    (tracking-param/scheme-case URL variant, earlier warc_ts, garbage text)
    must produce EXACTLY the clean corpus's clusters when url_tier=True —
    the stale crawls collapse to the latest before text extraction, so they
    can neither appear in the output nor edge anything."""
    import pyspark.sql.functions as F

    _, clusters, _ = run
    stale = pages_df.select(
        F.concat(
            F.lit("HTTP://"),
            F.regexp_replace("url", r"^https://", ""),
            F.lit("?utm_source=recrawl"),
        ).alias("url"),
        (F.col("warc_ts") - F.expr("INTERVAL 30 DAYS")).alias("warc_ts"),
        F.col("html"),
        F.lit("stale recrawl body that must never reach the dedup tiers").alias(
            "text"
        ),
        F.col("lang"),
    )
    noisy = pages_df.unionByName(stale)
    out = str(tmp_path_factory.mktemp("pipe_url"))
    p = DedupePipeline(spark, out, DedupeConfig(), run_id="t3", url_tier=True)
    got = p.run(noisy).toPandas()
    assert "00_url_dedup" in p.recomputed
    a = clusters.sort_values("url").reset_index(drop=True)
    b = got.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_resume_skips_and_matches(run, spark, pages_df):
    _, clusters, out = run
    p2 = DedupePipeline(spark, out, DedupeConfig(), run_id="t2")
    again = p2.run(pages_df).toPandas()
    assert p2.recomputed == []
    a = clusters.sort_values("url").reset_index(drop=True)
    b = again.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_resume_gate_uses_hadoop_fs(spark, pages_df, tmp_path):
    """The stage-done probe must go through the Hadoop FileSystem API, not
    os.path: with an explicit `file:` scheme URI (the local stand-in for an
    hdfs:/s3: out_dir), os.path.exists always answers False and resume would
    silently recompute every stage on every rerun."""
    out = f"file:{tmp_path}/resume_uri"
    small = pages_df.limit(60)
    p1 = DedupePipeline(spark, out, DedupeConfig(), run_id="u1")
    first = p1.run(small).toPandas()
    assert p1.recomputed != []
    p2 = DedupePipeline(spark, out, DedupeConfig(), run_id="u2")
    again = p2.run(small).toPandas()
    assert p2.recomputed == []  # fails if the gate falls back to os.path
    a = first.sort_values("url").reset_index(drop=True)
    b = again.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_metrics_lineage(run, spark):
    _, _, out = run
    m = spark.read.parquet(f"{out}/metrics").toPandas()
    stage_rows = m[m.partition_id == -1]
    assert set(stage_rows[stage_rows.status == "success"].stage) >= {
        "00_pages_clean",
        "02_sigs",
        "07_clusters",
    }
    assert (stage_rows.duration_ms.dropna() >= 0).all()
    # per-partition lineage rows exist
    assert (m.partition_id >= 0).any()


def test_lineage_has_no_driver_collect():
    """Per-partition lineage must stay engine-side: at thousands of
    stages x partitions a per-stage collect() serializes bookkeeping
    through the driver."""
    import inspect

    from fuzzy_dedupe_pipeline_spark.metrics import MetricsLog

    assert ".collect(" not in inspect.getsource(MetricsLog.log_partitions)


def test_metrics_compact_is_crash_safe(spark, tmp_path):
    """compact() must never overwrite the table in place: simulate the crash
    window (snapshot written, table renamed away, swap unfinished) and check
    the next read()/append() recovers every row."""
    from fuzzy_dedupe_pipeline_spark.fs import fs_rename
    from fuzzy_dedupe_pipeline_spark.metrics import MetricsLog, StageTimer

    log = MetricsLog(spark, str(tmp_path / "mrun"), "r1")
    for i in range(3):
        log.log_stage(f"s{i}", "success", StageTimer().start, rows_out=i)
    before = sorted(
        (r["stage"], r["rows_out"]) for r in log.read().collect()
    )

    # crash window: snapshot complete at __compact_tmp, table at __compact_old
    snapshot = log.read().localCheckpoint()
    snapshot.coalesce(1).write.mode("overwrite").parquet(
        f"{log.path}__compact_tmp"
    )
    fs_rename(spark, log.path, f"{log.path}__compact_old")

    log2 = MetricsLog(spark, str(tmp_path / "mrun"), "r2")
    log2.log_stage("s3", "success", StageTimer().start, rows_out=3)  # recovers
    after = sorted((r["stage"], r["rows_out"]) for r in log2.read().collect())
    assert after == before + [("s3", 3)]

    # and a normal compact keeps every row while shrinking to one file
    import glob

    log2.compact()
    assert sorted(
        (r["stage"], r["rows_out"]) for r in log2.read().collect()
    ) == after
    assert len(glob.glob(f"{log2.path}/*.parquet")) == 1


def test_quality_representatives_argmax_and_ties(spark):
    from pyspark.sql import functions as F

    from fuzzy_dedupe_pipeline_spark.canonical import quality_representatives

    members = spark.createDataFrame(
        [
            ("a", "c1"), ("b", "c1"), ("c", "c1"),
            ("d", "c2"), ("e", "c2"),
            ("f", "c3"),
        ],
        "id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [
            ("a", 0.5), ("b", 0.9), ("c", 0.9),   # tie at 0.9 -> min id "b"
            ("d", 0.1), ("e", 0.0),
            ("f", 0.7),
            ("zz", 1.0),                           # no member row -> ignored
        ],
        "id string, quality_score double",
    )
    got = {
        r.cluster_id: (r.rep_id, r.rep_score, r.n_members)
        for r in quality_representatives(members, scores).collect()
    }
    assert got == {
        "c1": ("b", 0.9, 3),
        "c2": ("d", 0.1, 2),
        "c3": ("f", 0.7, 1),
    }
    # scale shape: partial aggregation (no window/sort exchange on cluster)
    plan = quality_representatives(members, scores)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan
