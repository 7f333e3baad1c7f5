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
