"""Benchmark decontamination (decontam.py): correctness on hand-built docs,
hash-gram equivalence, and the scale contract — the corpus side must reach
the eval-gram probe and the flag-back join as BROADCAST hash joins, with no
shuffle of the corpus relation.

Reference parity note: the reference has no decontamination stage
(reference/dedupe_logic/processor.py dedups one table against itself); this
op extends the same gram machinery train-vs-eval as LLM pipelines require.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.decontam import (
    contaminated_ids,
    decontaminate,
    eval_grams,
    ngram_strings,
)
from fuzzy_dedupe_pipeline_spark.textstats import tokens_simple


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_strings_window_and_short_doc(spark):
    df = spark.range(1).select(
        ngram_strings(tokens_simple(F.lit("a b c d e")), 3).alias("g3"),
        ngram_strings(tokens_simple(F.lit("a b")), 3).alias("short"),
        ngram_strings(tokens_simple(F.lit("  a   b  c ")), 2).alias("ws"),
    )
    row = df.first()
    assert row.g3 == ["a b c", "b c d", "c d e"]
    assert row.short == []
    # runs of whitespace collapse: tokens are the non-empty split pieces
    assert row.ws == ["a b", "b c"]


def test_decontaminate_flags_exact_overlap_only(spark):
    # eval doc holds tokens e1..e5; train doc 1 embeds that exact 5-gram,
    # doc 2 shares only 4 consecutive tokens, doc 3 is disjoint.
    ev = _docs(spark, [(100, "e1 e2 e3 e4 e5")])
    tr = _docs(
        spark,
        [
            (1, "x y e1 e2 e3 e4 e5 z"),
            (2, "e1 e2 e3 e4 q r s t"),
            (3, "u v w x y z a b c"),
        ],
    )
    out = {
        r.doc_id: (r.contaminated, r.n_hits)
        for r in decontaminate(tr, ev, n=5).collect()
    }
    assert out == {1: (True, 1), 2: (False, 0), 3: (False, 0)}


def test_hit_count_is_distinct_grams(spark):
    # eval contributes two distinct 2-grams; the train doc contains each
    # twice -> n_hits counts distinct grams (2), not occurrences (4).
    ev = _docs(spark, [(100, "a b"), (101, "c d")])
    tr = _docs(spark, [(1, "a b c d a b c d")])
    (row,) = contaminated_ids(tr, eval_grams(ev, 2), 2).collect()
    assert (row.doc_id, row.n_hits) == (1, 2)


def test_hash_grams_matches_string_grams(spark):
    ev = _docs(spark, [(100, "e1 e2 e3 e4 e5"), (101, "f1 f2 f3 f4 f5")])
    tr = _docs(
        spark,
        [(i, f"pad{i} e1 e2 e3 e4 e5 tail{i}") for i in range(20)]
        + [(i + 100, f"clean{i} words only here now") for i in range(20)],
    )
    want = sorted(
        (r.doc_id, r.n_hits, r.contaminated)
        for r in decontaminate(tr, ev, n=5).collect()
    )
    got = sorted(
        (r.doc_id, r.n_hits, r.contaminated)
        for r in decontaminate(tr, ev, n=5, hash_grams=True).collect()
    )
    assert got == want


def test_plan_corpus_never_shuffles(spark):
    """The 100 TB contract: both joins against the corpus relation are
    broadcast hash joins; the only Exchange keys on doc_id hit rows /
    eval grams, never the full corpus gram explosion."""
    ev = _docs(spark, [(100, "e1 e2 e3 e4 e5")])
    tr = _docs(spark, [(i, f"w{i} e1 e2 e3 e4 e5") for i in range(50)])
    plan = _plan(decontaminate(tr, ev, n=5))
    # both corpus joins broadcast; no shuffled join anywhere
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    # the one corpus-gram-keyed exchange is the hit aggregation: it must sit
    # ABOVE the broadcast probe join (i.e. consume join output = hit rows
    # only, O(hits)); the tree prints parents before children, so a
    # BroadcastHashJoin must appear below it
    lines = plan.splitlines()
    hit_exchanges = [
        i
        for i, ln in enumerate(lines)
        if "Exchange hashpartitioning" in ln and "gram" in ln and "doc_id" in ln
    ]
    assert hit_exchanges, "expected the distinct-hit-count exchange"
    for i in hit_exchanges:
        assert any("BroadcastHashJoin" in ln for ln in lines[i + 1 :])
