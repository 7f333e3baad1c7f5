"""Incremental (Structured Streaming) dedup: order-independence vs batch.

The invariant: after draining a stream of page dumps, the label store's
partition of docs into clusters equals the batch pipeline's partition over
the same corpus at the same config (substring pass off — the streaming path
generates candidates via LSH only). Labels are min-id on both sides, so we
can compare (id, cluster_id) sets directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.dataflow import (
    clean_docs,
    dedupe_clusters,
)
from fuzzy_dedupe_pipeline_spark.streaming import IncrementalDedupe

CFG = DedupeConfig()


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return {
        "input": str(root / "input"),
        "state": str(root / "state"),
        "out": str(root / "out"),
        "ckpt": str(root / "ckpt"),
    }


def _batch_labels(spark, pages_df):
    out = dedupe_clusters(
        spark, pages_df, CFG, id_col="url", text_col="text", with_substring=False
    )
    return {r["url"]: r["cluster_id"] for r in out.collect()}


def test_stream_matches_batch(spark, pages_df, stream_dirs):
    # three dump files -> three micro-batches (maxFilesPerTrigger=1)
    n = pages_df.count()
    pages = pages_df.withColumn(
        "part", (F.xxhash64("url") % 3 + 3) % 3
    )
    for i in range(3):
        (
            pages.filter(F.col("part") == i)
            .drop("part")
            .coalesce(1)
            .write.mode("append")
            .parquet(stream_dirs["input"])
        )

    inc = IncrementalDedupe(spark, stream_dirs["state"], CFG)
    q = inc.run_stream(
        stream_dirs["input"],
        pages_df.schema,
        stream_dirs["out"],
        stream_dirs["ckpt"],
        id_col="url",
        text_col="text",
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(600)

    assignments = spark.read.parquet(stream_dirs["out"])
    assert assignments.count() == n
    assert assignments.select("id").distinct().count() == n
    assert assignments.select("batch_id").distinct().count() >= 2

    # final state labels = the authoritative incremental clustering
    labels = spark.read.parquet(f"{inc.labels_path}")
    got = {r["id"]: r["cluster_id"] for r in labels.collect()}
    want = _batch_labels(spark, pages_df)
    assert set(got) == set(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} label mismatches: {list(mismatches.items())[:5]}"


def test_stream_merges_clusters_across_batches(spark, stream_dirs, tmp_path):
    """A later doc bridging two earlier singleton docs must merge them in the
    label store (the remap path)."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four "
    ) * 4
    rows_a = [("u:a", base + "ending aaa")]
    rows_b = [("u:b", base + "ending bbb")]
    schema = "url string, text string"
    d = str(tmp_path / "in2")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(d)

    inc = IncrementalDedupe(spark, str(tmp_path / "state2"), CFG)
    q = inc.run_stream(
        d,
        spark.read.parquet(d).schema,
        str(tmp_path / "out2"),
        str(tmp_path / "ckpt2"),
        id_col="url",
        text_col="text",
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(300)

    labels = spark.read.parquet(inc.labels_path)
    got = {r["id"]: r["cluster_id"] for r in labels.collect()}
    assert got["u:a"] == got["u:b"] == "u:a"


def test_stream_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: reprocessing a committed batch must not
    duplicate sigs/bands rows, must not change labels, and must re-emit the
    same output rows."""
    rows = [
        ("u:x", "the quick brown fox jumps over the lazy dog " * 20),
        ("u:y", "completely different text about other things entirely " * 20),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    inc = IncrementalDedupe(spark, str(tmp_path / "state_r"), CFG)

    out1 = inc.process_batch(df, batch_id=0).collect()
    sigs_n1 = spark.read.parquet(inc.sigs_path).count()
    labels1 = sorted(
        (r["id"], r["cluster_id"])
        for r in spark.read.parquet(inc.labels_path).collect()
    )

    out2 = inc.process_batch(df, batch_id=0).collect()  # replay
    sigs_n2 = spark.read.parquet(inc.sigs_path).count()
    labels2 = sorted(
        (r["id"], r["cluster_id"])
        for r in spark.read.parquet(inc.labels_path).collect()
    )
    assert sigs_n1 == sigs_n2 == 2
    assert labels1 == labels2
    assert sorted((r["id"], r["cluster_id"]) for r in out1) == sorted(
        (r["id"], r["cluster_id"]) for r in out2
    )


def test_stream_crash_replay_converges(spark, tmp_path):
    """Replay after a crash BEFORE the commit marker (state writes may have
    landed) must converge to the same state as a clean run."""
    rows = [("u:c1", "alpha beta gamma delta epsilon zeta eta theta " * 20)]
    df = spark.createDataFrame(rows, "url string, text string")
    inc = IncrementalDedupe(spark, str(tmp_path / "state_c"), CFG)
    inc.process_batch(df, batch_id=0)
    # batch 1 "crashed" right before the marker: simulate by processing then
    # deleting the marker
    rows2 = [("u:c2", "one two three four five six seven eight nine ten " * 20)]
    df2 = spark.createDataFrame(rows2, "url string, text string")
    inc.process_batch(df2, batch_id=1)
    import os

    os.remove(f"{inc.commits_path}/batch_1")
    inc.process_batch(df2, batch_id=1)  # replay from scratch
    sigs = spark.read.parquet(inc.sigs_path)
    assert sigs.count() == 2  # no duplicate rows for u:c2
    labels = {
        r["id"]: r["cluster_id"]
        for r in spark.read.parquet(inc.labels_path).collect()
    }
    assert labels == {"u:c1": "u:c1", "u:c2": "u:c2"}


def test_stream_reseen_id_first_wins(spark, tmp_path):
    """A re-crawled url in a later batch must NOT re-enter the index (no
    self-pairs, no conflicting label rows) — first-seen text wins."""
    text = "shared boilerplate tokens " * 30
    b0 = spark.createDataFrame([("u:r", text)], "url string, text string")
    b1 = spark.createDataFrame(
        [("u:r", text + "updated"), ("u:s", "unrelated fresh page words " * 25)],
        "url string, text string",
    )
    inc = IncrementalDedupe(spark, str(tmp_path / "state_s"), CFG)
    inc.process_batch(b0, batch_id=0)
    out = inc.process_batch(b1, batch_id=1)
    # output covers only first-seen ids of the batch
    assert {r["id"] for r in out.collect()} == {"u:s"}
    labels = spark.read.parquet(inc.labels_path)
    by_id = labels.groupBy("id").count().filter("count > 1").count()
    assert by_id == 0  # exactly one label row per id
    sigs = spark.read.parquet(inc.sigs_path)
    assert sigs.filter(F.col("id") == "u:r").count() == 1


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """readStream + event-time window agg (the Structured Streaming shape of
    tumbling_window_agg) drained with availableNow == the batch result."""
    src = "/root/testdata/sf0.001/events.parquet"
    # watermarks need TIMESTAMP (LTZ); the table stores TIMESTAMP_NTZ.
    # session TZ is UTC so the cast is value-preserving.
    events = spark.read.parquet(src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = lambda df: (
        df.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in agg(events).collect()}

    indir = str(tmp_path / "ev_in")
    events.repartition(3).write.mode("overwrite").parquet(indir)
    stream = spark.readStream.schema(events.schema).parquet(indir)
    q = (
        agg(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got == want
