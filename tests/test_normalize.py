"""Normalization parity: Spark column expressions vs the reference's Python
regex semantics (re-executed byte-for-byte by the oracle module, which mirrors
dedupe_logic/processor.py:47-60)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark import oracle
from fuzzy_dedupe_pipeline_spark.normalize import (
    address_text_col,
    canonical_field_mapping,
    clean_sentinels,
    extract_city_col,
    extract_state_col,
    extract_text_udf,
    extract_zip_col,
    normalize_phone_col,
    normalize_text_col,
    semantic_text_col,
)

TRICKY = [
    "Hello, World!",
    "  MULTI   space\tand\nnewlines  ",
    "punct-only !!! ??? ...",
    "unicode: Café MÜNCHEN 北京 ελλάδα",
    "a , b",  # punct removal after ws collapse -> double space
    "",
    "already clean text",
    "#ERROR!",
    "123-456-7890 ext. 99",
]


def test_normalize_text_parity(spark):
    df = spark.createDataFrame([(t,) for t in TRICKY], ["t"])
    got = [r[0] for r in df.select(normalize_text_col(F.col("t"))).collect()]
    want = [oracle.normalize_text(t) for t in TRICKY]
    assert got == want


def test_normalize_null(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(normalize_text_col(F.col("t"))).collect()[0][0] == ""


def test_normalize_phone_parity(spark):
    phones = ["(555) 123-4567", "555.123.4567", "#ERROR!", "", "+1 555 000", None]
    df = spark.createDataFrame([(p,) for p in phones], "p string")
    got = [r[0] for r in df.select(normalize_phone_col(F.col("p"))).collect()]
    want = [oracle.normalize_phone(p) for p in phones]
    assert got == want


def test_sentinels(spark):
    vals = ["none", "NaN", "NULL", "#error!", "", "  ", "ok", None]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(clean_sentinels(F.col("v"))).collect()]
    assert got == [None, None, None, None, None, None, "ok", None]


def test_address_extraction(spark):
    # reference logic: zip regex, city = parts[-2] (no digit in first 3 chars),
    # state = [A-Z]{2} in last part (processor.py:343-365)
    rows = [
        ("123 Main St, Springfield, IL 62704", "62704", "Springfield", "IL"),
        ("987 Oak Ave Suite 4, Portland, OR 97201-1234", "97201", "Portland", "OR"),
        ("No commas here 55555", "55555", "", ""),
        ("1 A St, 22 B City, TX 75001", "75001", "", "TX"),  # digit-leading city
    ]
    df = spark.createDataFrame([(a,) for a, *_ in rows], "addr string")
    got = df.select(
        extract_zip_col(F.col("addr")).alias("z"),
        extract_city_col(F.col("addr")).alias("c"),
        extract_state_col(F.col("addr")).alias("s"),
    ).collect()
    for (a, z, c, s), r in zip(rows, got):
        assert (r.z, r.c, r.s) == (z, c, s), a


def test_canonical_field_mapping(spark):
    df = spark.createDataFrame(
        [
            (1, "Vet One", "1 Main St, Austin, TX 78701", None, None, None,
             "(512) 555-0101", None, None, "https://vet.one", None),
            (2, "Vet Two", "", "None", "nan", "NULL",
             "", "p2", "e@x.com", "", "http://fallback"),
        ],
        "id long, name string, address string, city string, state string, zip string, "
        "phone_number string, phone string, email string, open_website string, url string",
    )
    out = {r.id: r for r in canonical_field_mapping(df).collect()}
    r1 = out[1]
    assert (r1.city, r1.state, r1.zip) == ("Austin", "TX", "78701")
    assert r1.phone == "(512) 555-0101"
    assert r1.website == "https://vet.one"
    r2 = out[2]
    assert (r2.city, r2.state, r2.zip) == ("", "", "")  # sentinels scrubbed
    assert r2.phone == "p2"  # coalesce priority phone_number||phone
    assert r2.website == "http://fallback"  # open_website||website||url


def test_feature_concat_parity(spark):
    """P4/P5 literal ops vs the reference's Python expressions
    (dedupe_logic/processor.py:70-86)."""
    rows = [
        ("Joe's Pizza", "restaurant", "1 Main St", "Springfield", "IL", "62701"),
        ("", "", "", "", "", ""),
        ("OnlyName", None, None, None, None, None),
        (None, "cat only", "", "Town", "", "00001"),
        ("  spaced  ", "x", "a", None, "b", None),
    ]
    df = spark.createDataFrame(
        rows, "name string, category string, address string, city string, "
        "state string, zip string"
    )
    got = df.select(
        semantic_text_col(F.col("name"), F.col("category")).alias("sem"),
        address_text_col(
            F.col("address"), F.col("city"), F.col("state"), F.col("zip")
        ).alias("addr"),
    ).collect()

    def ref_sem(name, category):
        s = f"{name or ''} {category or ''}".strip()
        return s if s else "unknown"

    def ref_addr(*parts):
        s = " ".join(filter(None, (str(p) if p else "" for p in parts)))
        return s if s else "unknown"

    for row, r in zip(rows, got):
        assert r["sem"] == ref_sem(row[0], row[1]), row
        assert r["addr"] == ref_addr(*row[2:]), row


def test_html_extraction_byte_identical(spark, pages_df, corpus):
    """Input-hint invariant: extracted text must equal the stored text column
    byte-for-byte, per url."""
    got = (
        pages_df.select("url", "text", extract_text_udf(F.col("html")).alias("ex"))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert got == 0


def test_extract_handles_null_and_garbage(spark):
    df = spark.createDataFrame(
        [(None,), (bytearray(b"not html at all"),)], "html binary"
    )
    got = [r[0] for r in df.select(extract_text_udf(F.col("html"))).collect()]
    assert got == [None, None]
