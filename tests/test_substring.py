"""Winnowed-fingerprint substring pass: detection guarantee for shared runs
>= gram + winnow_window - 1 tokens (Schleimer/Wilkerson/Aiken winnowing)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.normalize import tokens_col
from fuzzy_dedupe_pipeline_spark.substring import substring_candidates

CFG = DedupeConfig()
GUARANTEE = CFG.substring_gram + CFG.winnow_window - 1  # 50


def _pairs(spark, docs):
    df = spark.createDataFrame(docs, "id string, text string")
    toks = df.select("id", tokens_col(F.col("text")).alias("tokens"))
    pairs, _ = substring_candidates(toks, CFG)
    return {(r.id1, r.id2) for r in pairs.collect()}


def _words(rng, n):
    return [f"u{rng.integers(0, 10**9)}" for _ in range(n)]


def test_guaranteed_run_detected(spark):
    rng = np.random.default_rng(3)
    shared = _words(rng, GUARANTEE)
    a = _words(rng, 100) + shared + _words(rng, 80)
    b = _words(rng, 40) + shared + _words(rng, 200)
    got = _pairs(spark, [("a", " ".join(a)), ("b", " ".join(b))])
    assert ("a", "b") in got


def test_disjoint_docs_not_paired(spark):
    rng = np.random.default_rng(4)
    a = " ".join(_words(rng, 300))
    b = " ".join(_words(rng, 300))
    assert _pairs(spark, [("a", a), ("b", b)]) == set()


def test_short_shared_run_below_gram_not_detected(spark):
    rng = np.random.default_rng(5)
    shared = _words(rng, CFG.substring_gram - 5)  # below gram width
    a = _words(rng, 120) + shared + _words(rng, 120)
    b = _words(rng, 90) + shared + _words(rng, 150)
    assert _pairs(spark, [("a", " ".join(a)), ("b", " ".join(b))]) == set()


def test_doc_shorter_than_gram_ok(spark):
    assert _pairs(spark, [("a", "tiny doc"), ("b", "tiny doc")]) == set()
