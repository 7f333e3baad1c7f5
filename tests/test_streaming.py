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
