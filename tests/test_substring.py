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


def _h(tokens):
    import numpy as np

    # deterministic per-token 64-bit values standing in for xxhash64
    return np.array([hash(t) & 0xFFFFFFFFFFFFFFFF for t in tokens], dtype=np.uint64)


def test_lcs_token_run_exact_lengths():
    from fuzzy_dedupe_pipeline_spark.substring import lcs_token_run

    run = [f"r{i}" for i in range(57)]
    a = _h([f"a{i}" for i in range(20)] + run + [f"A{i}" for i in range(9)])
    b = _h([f"b{i}" for i in range(5)] + run + [f"B{i}" for i in range(30)])
    assert lcs_token_run(a, b) == 57
    # disjoint docs share nothing
    assert lcs_token_run(_h(["x", "y", "z"]), _h(["p", "q"])) == 0
    # identical doc: the whole length
    assert lcs_token_run(a, a.copy()) == a.size
    # empty side
    assert lcs_token_run(a[:0], b) == 0
    # run at the very start / very end (boundary windows)
    assert lcs_token_run(_h(run + ["a1"]), _h(run + ["b1"])) == 57
    assert lcs_token_run(_h(["a1"] + run), _h(["b1"] + run)) == 57
    # single shared token
    assert lcs_token_run(_h(["x", "k", "y"]), _h(["p", "k", "q"])) == 1


def test_lcs_scattered_overlap_is_not_a_run():
    from fuzzy_dedupe_pipeline_spark.substring import lcs_token_run

    # high shingle overlap but max contiguous run of 2: the shingle-count
    # proxy would over-read this; the exact verifier must not
    common = [f"c{i}" for i in range(40)]
    a = _h([t for i, t in enumerate(common) if True])
    # interleave separators on one side so no 3 consecutive tokens align
    b_tokens = []
    for i in range(0, 40, 2):
        b_tokens += [common[i], common[i + 1], f"sep{i}"]
    b = _h(b_tokens)
    assert lcs_token_run(a, b) == 2


def test_exact_lcs_pairs_dataframe(spark):
    from fuzzy_dedupe_pipeline_spark.substring import exact_lcs_pairs

    run = " ".join(f"r{i}" for i in range(55))
    docs = spark.createDataFrame(
        [
            ("d1", ("alpha beta " + run + " gamma").split()),
            ("d2", ("delta " + run + " epsilon zeta").split()),
            ("d3", "wholly unrelated words here".split()),
        ],
        "id string, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d1", "d3")], "id1 string, id2 string"
    )
    got = {
        (r.id1, r.id2): r.lcs_tokens
        for r in exact_lcs_pairs(docs, pairs).collect()
    }
    assert got == {("d1", "d2"): 55, ("d1", "d3"): 0}
