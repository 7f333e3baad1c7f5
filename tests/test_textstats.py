from __future__ import annotations

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.textstats import (
    lang_id_col,
    quality_score_cols,
    token_count_col,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], "text string"
    )
    got = [r[0] for r in df.select(token_count_col(F.col("text"))).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is fine",),
            ("el perro y la casa de un amigo en madrid",),
            ("der hund und die katze ist von mir",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id_col(F.col("text"))).collect()]
    assert got == ["en", "es", "de", "und"]


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [(1, "word " * 60), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in quality_score_cols(df).collect()}
    assert 0.0 <= out[1].quality_score <= 1.0
    assert out[1].quality_score > out[2].quality_score
    assert out[3].n_tokens == 0 and out[3].quality_score == 0.1  # punct arm only


def test_ngram_hot_gram_cap(spark):
    """A gram shared by every doc must not blow up pair generation O(m^2):
    over-cap grams are excluded and reported, never silently kept."""
    from fuzzy_dedupe_pipeline_spark.textstats import ngram_jaccard_pairs

    hot = "aaa bbb ccc"
    rows = [
        (f"d{i:03d}", "en", "s", f"{hot} unique{i} filler{i} words{i} here{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, lang string, source string, text string"
    )
    # cap below the planted bucket: the hot gram is dropped and logged
    pairs, dropped = ngram_jaccard_pairs(docs, n=3, max_gram_bucket=10)
    assert pairs.count() == 0
    d = dropped.collect()
    assert len(d) >= 1 and all(r["bucket_size"] == 40 for r in d)
    # cap above it: full pair set returns (jaccard 1/(4+4-1) > 0.01)
    pairs2, dropped2 = ngram_jaccard_pairs(docs, n=3, max_gram_bucket=100)
    assert pairs2.count() == 40 * 39 // 2
    assert dropped2.count() == 0


def test_simhash_hot_chunk_cap(spark):
    """Docs collapsing onto one simhash are a hot chunk bucket: pair
    generation must stay bounded under the cap."""
    from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
    from fuzzy_dedupe_pipeline_spark.dataflow import clean_docs, simhash_near_dup_pairs

    text = "identical boilerplate page body words repeated " * 8
    docs = spark.createDataFrame(
        [(f"u{i:03d}", text) for i in range(30)], "url string, text string"
    )
    clean = clean_docs(docs, "url", "text")
    capped = simhash_near_dup_pairs(
        clean, DedupeConfig(max_band_bucket=10), max_hamming=3
    )
    assert capped.count() == 0  # every chunk bucket is hot -> dropped
    full = simhash_near_dup_pairs(
        clean, DedupeConfig(max_band_bucket=5000), max_hamming=3
    )
    assert full.count() == 30 * 29 // 2


def test_repetition_stats_exact_values(spark):
    from fuzzy_dedupe_pipeline_spark.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b c"),   # 5 toks / 3 distinct; bigrams: ab,ba,ab,bc -> 4/3
            (2, "one"),          # single token: no bigrams
            (3, ""),             # empty
            (4, "x x x x"),     # maximal repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].n_tokens == 5 and out[1].n_distinct_tokens == 3
    assert abs(out[1].dup_token_ratio - (1 - 3 / 5)) < 1e-9
    assert abs(out[1].dup_bigram_ratio - (1 - 3 / 4)) < 1e-9
    # n<2 guard: sequence(1,0) must NOT fabricate a descending-range bigram
    assert out[2].dup_bigram_ratio == 0.0 and out[3].dup_bigram_ratio == 0.0
    assert out[4].dup_token_ratio == 0.75
    assert abs(out[4].dup_bigram_ratio - 2 / 3) < 1e-6  # column rounds to 6dp


def test_top_ngrams_deterministic_ties(spark):
    from fuzzy_dedupe_pipeline_spark.textstats import top_ngrams

    df = spark.createDataFrame(
        [(1, "b c"), (2, "a b"), (3, "a b"), (4, "b c")],
        "doc_id long, text string",
    )
    got = top_ngrams(df, k=2).collect()
    assert [(r.gram, r.n_occurrences) for r in got] == [("a b", 2), ("b c", 2)]


def test_c4_line_filter_rules(spark):
    from fuzzy_dedupe_pipeline_spark.textstats import c4_line_filter

    df = spark.createDataFrame(
        [
            (
                1,
                "\n".join(
                    [
                        "this line ends properly with five words.",
                        "short line.",
                        "a config block { inside } never survives here.",
                        "Lorem Ipsum dolor sit amet consectetur elit.",
                        "no terminal punctuation on this long line",
                        'he said "quoted endings also count as terminal."',
                        "does a question mark count as terminal punctuation?",
                    ]
                ),
            ),
            (2, "everything here fails\n\nx."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_line_filter(df).collect()}
    assert out[1].text_clean == "\n".join(
        [
            "this line ends properly with five words.",
            'he said "quoted endings also count as terminal."',
            "does a question mark count as terminal punctuation?",
        ]
    )
    assert (out[1].n_lines, out[1].n_kept) == (7, 3)
    assert (out[2].text_clean, out[2].n_lines, out[2].n_kept) == ("", 2, 0)


def test_c4_line_filter_map_only_plan(spark):
    from fuzzy_dedupe_pipeline_spark.textstats import c4_line_filter

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
