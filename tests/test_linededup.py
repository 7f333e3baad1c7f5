"""Corpus-level boilerplate line removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.linededup import frequent_lines, remove_boilerplate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_removes_frequent_preserves_order(spark):
    docs = _docs(
        spark,
        [
            (1, "nav\nalpha\nfooter\nbeta"),
            (2, "nav\ngamma\nfooter"),
            (3, "nav\ndelta"),
        ],
    )
    out = {
        r.doc_id: (r.text_clean, r.n_lines, r.n_removed)
        for r in remove_boilerplate(docs, min_docs=2).collect()
    }
    assert out == {
        1: ("alpha\nbeta", 4, 2),
        2: ("gamma", 3, 2),
        3: ("delta", 2, 1),
    }


def test_internal_repetition_counts_one_doc(spark):
    # a line repeated 5x INSIDE one doc is still df=1 -> not boilerplate
    docs = _docs(
        spark,
        [(1, "spam\nspam\nspam\nspam\nspam"), (2, "other")],
    )
    assert frequent_lines(docs, min_docs=2).count() == 0
    out = remove_boilerplate(docs, min_docs=2).filter(F.col("doc_id") == 1).first()
    assert out.text_clean == "spam\nspam\nspam\nspam\nspam"
    assert out.n_removed == 0


def test_all_boilerplate_doc_survives_empty(spark):
    docs = _docs(spark, [(1, "nav"), (2, "nav"), (3, "nav\nkeep")])
    out = {r.doc_id: r.text_clean for r in remove_boilerplate(docs, min_docs=3).collect()}
    assert out == {1: "", 2: "", 3: "keep"}


def test_null_text_is_zero_lines(spark):
    docs = _docs(spark, [(1, None), (2, "nav"), (3, "nav")])
    out = {r.doc_id: r for r in remove_boilerplate(docs, min_docs=2).collect()}
    assert (out[1].text_clean, out[1].n_lines, out[1].n_removed) == ("", 0, 0)


def test_blank_lines_ignored(spark):
    docs = _docs(spark, [(1, "a\n\n  \nb"), (2, "c")])
    row = remove_boilerplate(docs, min_docs=2).filter(F.col("doc_id") == 1).first()
    assert (row.text_clean, row.n_lines) == ("a\nb", 2)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_default_is_broadcast_hash_anti_join(spark):
    # the default boilerplate probe is a broadcast HASH anti join (O(1)
    # probe, set lives in the join's hash relation) — never a collected
    # array scanned per line, never a shuffle join of the corpus
    docs = _docs(spark, [(1, "a\nb"), (2, "a")])
    plan = _plan(remove_boilerplate(docs, min_docs=2))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "array_contains" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_broadcast_array_impl_is_map_side(spark):
    # the tiny-set variant stays map-side: the only join is the 1-row
    # broadcast of the collected set — no explode/re-assembly of the corpus
    docs = _docs(spark, [(1, "a\nb"), (2, "a")])
    plan = _plan(remove_boilerplate(docs, min_docs=2, impl="broadcast_array"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Generate") == 1  # one explode (the frequency count side)


def test_impls_agree(spark):
    # both impls produce identical rows on the adversarial corpus: NULL
    # text, all-boilerplate doc, internal repetition, blank lines, a doc
    # with zero boilerplate
    docs = _docs(
        spark,
        [
            (1, None),
            (2, "nav\nalpha\nnav\nbeta"),
            (3, "nav"),
            (4, "nav\n\n  \ngamma"),
            (5, "delta\nepsilon"),
            (6, "nav\nzeta"),
        ],
    )
    key = lambda r: (r.doc_id, r.text_clean, r.n_lines, r.n_removed)
    a = sorted(map(key, remove_boilerplate(docs, min_docs=3).collect()))
    b = sorted(
        map(
            key,
            remove_boilerplate(docs, min_docs=3, impl="broadcast_array").collect(),
        )
    )
    assert a == b
    # and the anti-join rows are right on their own terms
    assert dict((r[0], r[1]) for r in a) == {
        1: "",
        2: "alpha\nbeta",
        3: "",
        4: "gamma",
        5: "delta\nepsilon",
        6: "zeta",
    }


def test_metachar_separator_is_literal(spark):
    # sep feeds F.split (regex) on the way in but concat_ws (literal) on the
    # way out — a metacharacter sep like '|' must round-trip as a literal,
    # not explode every doc per-character
    docs = _docs(
        spark,
        [
            (1, "nav | alpha | beta"),
            (2, "nav | gamma"),
            (3, "nav"),
        ],
    )
    out = {
        r.doc_id: (r.text_clean, r.n_lines, r.n_removed)
        for r in remove_boilerplate(docs, sep="|", min_docs=2).collect()
    }
    assert out == {
        1: ("alpha|beta", 3, 1),
        2: ("gamma", 2, 1),
        3: ("", 1, 1),
    }
