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


# -- duplicate-span removal (Lee et al. ACL'22 transform) --------------------


def test_shared_span_ranges_exact_and_brute_force():
    from fuzzy_dedupe_pipeline_spark.substring import shared_span_ranges

    run = [f"r{i}" for i in range(12)]
    keep = _h([f"a{i}" for i in range(20)] + run + [f"A{i}" for i in range(20)])
    vict = _h([f"b{i}" for i in range(10)] + run + [f"B{i}" for i in range(15)])
    assert shared_span_ranges(keep, vict, 8) == [(10, 22)]
    # run shorter than width -> nothing
    assert shared_span_ranges(keep, vict, 13) == []
    # identical docs -> everything
    assert shared_span_ranges(keep, keep.copy(), 8) == [(0, int(keep.size))]
    # brute-force cross-check on random arrays with planted overlaps
    rng = np.random.default_rng(11)
    for trial in range(20):
        w = int(rng.integers(3, 7))
        ka = [f"k{trial}_{i}" for i in range(40)]
        vb = [f"v{trial}_{i}" for i in range(40)]
        # plant 0-2 shared runs at random spots
        for _ in range(int(rng.integers(0, 3))):
            ln = int(rng.integers(1, 12))
            src = int(rng.integers(0, 40 - ln))
            dst = int(rng.integers(0, 40 - ln))
            vb[dst : dst + ln] = ka[src : src + ln]
        k, v = _h(ka), _h(vb)
        got = shared_span_ranges(k, v, w)
        # brute force: token index i of v is covered iff some window
        # [p, p+w) containing i matches somewhere in k verbatim
        covered = set()
        for p in range(len(vb) - w + 1):
            win = vb[p : p + w]
            for q in range(len(ka) - w + 1):
                if ka[q : q + w] == win:
                    covered.update(range(p, p + w))
                    break
        want = sorted(covered)
        got_idx = sorted(i for s, e in got for i in range(s, e))
        assert got_idx == want, (trial, w, got, want)


def test_remove_duplicate_spans_end_to_end(spark):
    from fuzzy_dedupe_pipeline_spark.substring import remove_duplicate_spans

    run = [f"R{i}" for i in range(12)]
    run2 = [f"S{i}" for i in range(9)]
    pages = spark.createDataFrame(
        [
            # keeper of run (vs b) and of run2 (vs d)
            ("a", [f"a{i}" for i in range(10)] + run + [f"A{i}" for i in range(10)]),
            # victim: loses exactly the 12 run tokens
            ("b", [f"b{i}" for i in range(5)] + run + [f"B{i}" for i in range(8)]),
            # untouched bystander
            ("c", [f"c{i}" for i in range(25)]),
            # victim of TWO keepers (a: run2 via separate pair; b's filler no)
            ("d", run2 + [f"d{i}" for i in range(6)] + run + [f"D{i}" for i in range(4)]),
            # second keeper supplying run2 to d
            ("e", [f"e{i}" for i in range(7)] + run2 + [f"E{i}" for i in range(7)]),
        ],
        "id string, tokens array<string>",
    )
    # d is victim of keeper a (loses run) while simultaneously keeper of
    # run2 vs e -- exercising the single-pass both-roles semantics
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "d"), ("d", "e")], "id1 string, id2 string"
    )
    out = {
        r.id: r
        for r in remove_duplicate_spans(pages, pairs, min_run=8).collect()
    }
    orig = {r.id: r.tokens for r in pages.collect()}
    # keepers + bystander untouched
    for kid in ("a", "c"):
        assert out[kid].n_removed_tokens == 0
        assert out[kid].tokens == orig[kid]
    # b loses exactly the 12 run tokens, order of the rest preserved
    assert out["b"].n_removed_tokens == 12
    assert out["b"].tokens == [f"b{i}" for i in range(5)] + [
        f"B{i}" for i in range(8)
    ]
    # d is victim of (a,d) -> loses run (12), keeps run2 (it is keeper vs e)
    assert out["d"].n_removed_tokens == 12
    assert out["d"].tokens == run2 + [f"d{i}" for i in range(6)] + [
        f"D{i}" for i in range(4)
    ]
    # e loses run2 (9 tokens) to keeper d
    assert out["e"].n_removed_tokens == 9
    assert out["e"].tokens == [f"e{i}" for i in range(7)] + [
        f"E{i}" for i in range(7)
    ]


def test_remove_duplicate_spans_full_duplicate_and_noop(spark):
    from fuzzy_dedupe_pipeline_spark.substring import remove_duplicate_spans

    body = [f"t{i}" for i in range(20)]
    pages = spark.createDataFrame(
        [("a", body), ("b", list(body))],
        "id string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    out = {
        r.id: r
        for r in remove_duplicate_spans(pages, pairs, min_run=8).collect()
    }
    assert out["a"].tokens == body and out["a"].n_removed_tokens == 0
    assert out["b"].tokens == [] and out["b"].n_removed_tokens == 20
    # empty pair set -> identity transform
    none = spark.createDataFrame([], "id1 string, id2 string")
    out2 = {
        r.id: r for r in remove_duplicate_spans(pages, none, min_run=8).collect()
    }
    assert out2["b"].tokens == body and out2["b"].n_removed_tokens == 0
