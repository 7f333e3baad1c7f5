"""Normalization + cleaning projections — all JVM-side built-in expressions,
plus one Arrow pandas UDF for html->text extraction.

Parity targets in the reference:
  normalize_text   dedupe_logic/processor.py:53-60  (byte-for-byte)
  normalize_phone  dedupe_logic/processor.py:47-51
  sentinel scrub   dedupe_logic/processor.py:416-424, sheets_sync/sync.py:126-131
  zip extraction   dedupe_logic/processor.py:343-347
  city/state parse dedupe_logic/processor.py:349-365
  coalesce mapping dedupe_logic/processor.py:373-408
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (?U) makes Java regex \w/\s Unicode-aware, matching Python `re` semantics of
# the reference's patterns.
_NONWORD_PATTERN = r"(?U)[^\w\s]"
_WS_PATTERN = r"(?U)\s+"
# keep-runs complement of _NONWORD_PATTERN (see normalize_text_col)
_WORD_WS_RUNS = r"(?U)[\w\s]+"

SENTINELS = ("", "none", "nan", "null", "#error!")


def normalize_text_col(c: Column) -> Column:
    """lower -> strip -> collapse whitespace -> drop non-word/space chars.

    Exact operation order of the reference (processor.py:56-59); note punct
    removal happens AFTER whitespace collapse, so 'a , b' -> 'a  b' (double
    space) — tokenization must split on whitespace runs, not single spaces.
    Null/empty input -> '' (processor.py:54-55).

    Parity domain (property-tested vs the reference's Python regexes in
    tests/test_properties.py): byte-identical except for documented
    JVM-vs-CPython character-class divergences — Java (?U)\\w includes
    combining marks (Mn/Mc/Me) and excludes non-decimal numbers (No/Nl,
    e.g. '¼'); CPython \\s includes \\x1c-\\x1f, Unicode White_Space does
    not; and Unicode-VERSION skew: CPython 3.11 carries Unicode 14 tables,
    JVM 17 carries Unicode 13, so code points assigned between the two
    (e.g. U+1DF00, a Unicode-14 letter) are \\w to one runtime and
    unassigned to the other. None occur in the reference's input domain.

    NOT string-idempotent (matching the reference): punct removal can leave
    edge whitespace ('0 :' -> '0 '); token streams ARE stable under
    re-normalization, which is what shingling consumes.
    """
    # trim AFTER the \s+ collapse: Spark trim strips only ASCII ' ', but the
    # reference's Python .strip() strips ALL whitespace (tab, NBSP, ...);
    # collapsing first reduces any edge whitespace run to a single ' ', which
    # trim then removes — exactly .strip()-then-collapse semantics
    out = F.lower(c.cast("string"))
    out = F.trim(F.regexp_replace(out, _WS_PATTERN, " "))
    # char-REMOVAL via keep-run concatenation instead of a negated-class
    # regexp_replace: Java regex restarts a find() attempt at every position
    # when the pattern rarely matches, so `[^\w\s]` costs ~12x more than
    # matching the kept runs `[\w\s]+` (one find per run) and concatenating
    # them — measured 3.1s -> 0.25s over 50k docs x 32 cores (r6). The kept
    # chars are exactly the complement of the removed class, so the output
    # is byte-identical for every input (NULL -> NULL -> coalesce '').
    out = F.array_join(F.regexp_extract_all(out, F.lit(_WORD_WS_RUNS), 0), "")
    return F.coalesce(out, F.lit(""))


def tokens_col(c: Column) -> Column:
    """Whitespace tokens of normalized text; mirrors Python str.split()
    (drops empty strings from leading/trailing/double whitespace)."""
    return F.filter(F.split(normalize_text_col(c), r"\s+"), lambda x: x != "")


def tokens_raw_col(c: Column) -> Column:
    """Whitespace tokens of ALREADY-normalized text — identical output to
    tokens_col on normalize_text_col output (normalization is idempotent and
    the empty-string filter absorbs leading/trailing whitespace), minus the
    two regex passes."""
    return F.filter(F.split(F.coalesce(c, F.lit("")), r"\s+"), lambda x: x != "")


def normalize_phone_col(c: Column) -> Column:
    """Digits only; '#ERROR!'/null -> '' (processor.py:47-51)."""
    digits = F.regexp_replace(c.cast("string"), r"\D", "")
    return F.when(c.isNull() | (c == "#ERROR!"), F.lit("")).otherwise(digits)


def clean_sentinels(c: Column) -> Column:
    """''/'none'/'nan'/'null'/'#ERROR!' (case-insensitive) -> NULL.
    Ingest-side analog of the sentinel checks scattered through the reference
    (sync.py:127, processor.py:330-335,416-424); we use real NULLs."""
    low = F.lower(F.trim(c.cast("string")))
    return F.when(low.isin(*SENTINELS), F.lit(None).cast("string")).otherwise(
        F.trim(c.cast("string"))
    )


def extract_zip_col(addr: Column) -> Column:
    """regex \\b(\\d{5})(?:-\\d{4})?\\b over the address (processor.py:343-347);
    '' when absent."""
    return F.regexp_extract(addr.cast("string"), r"\b(\d{5})(?:-\d{4})?\b", 1)


def extract_city_col(addr: Column) -> Column:
    """parts[-2] of comma-split address if >=3 parts and its first 3 chars
    contain no digit (processor.py:352-358)."""
    parts = F.split(addr.cast("string"), ",")
    # try_element_at: ANSI mode (Spark 4 default) makes element_at throw on
    # short arrays even under a when() guard
    cand = F.trim(F.try_element_at(parts, F.lit(-2)))
    ok = (F.size(parts) >= 3) & (cand != "") & ~F.substring(cand, 1, 3).rlike(r"\d")
    return F.when(ok, cand).otherwise(F.lit(""))


def extract_state_col(addr: Column) -> Column:
    """first \\b[A-Z]{2}\\b in the last comma-part if >=3 parts
    (processor.py:360-365)."""
    parts = F.split(addr.cast("string"), ",")
    last = F.trim(F.try_element_at(parts, F.lit(-1)))
    st = F.regexp_extract(last, r"\b([A-Z]{2})\b", 1)
    return F.when(F.size(parts) >= 3, st).otherwise(F.lit(""))


def semantic_text_col(name: Column, category: Column) -> Column:
    """P4 feature concat (semantic): f"{name} {category}".strip() with
    'unknown' fallback when empty (dedupe_logic/processor.py:70-75).
    NULL inputs are treated as '' (the reference's record.get defaults;
    literal None values are scrubbed upstream by clean_sentinels)."""
    base = F.trim(
        F.concat_ws(
            " ",
            F.coalesce(name.cast("string"), F.lit("")),
            F.coalesce(category.cast("string"), F.lit("")),
        )
    )
    return F.when(base == "", F.lit("unknown")).otherwise(base)


def address_text_col(*parts: Column) -> Column:
    """P5 feature concat (address): ' '.join(filter(None, parts)) with
    'unknown' fallback (dedupe_logic/processor.py:77-86) — empty/NULL parts
    are dropped entirely, so no doubled separators."""
    arr = F.array(*[F.coalesce(p.cast("string"), F.lit("")) for p in parts])
    joined = F.array_join(F.filter(arr, lambda x: x != ""), " ")
    return F.when(joined == "", F.lit("unknown")).otherwise(joined)


def final_sentinel_scrub(c: Column) -> Column:
    """'none'/'nan'/'null' (case-insensitive) and '#ERROR!' -> ''
    (processor.py:416-424)."""
    low = F.lower(c)
    return F.when(
        low.isin("none", "nan", "null") | (c == "#ERROR!"), F.lit("")
    ).otherwise(c)


def canonical_field_mapping(df: DataFrame) -> DataFrame:
    """The reference's 12-column output projection (processor.py:368-414) on a
    records DataFrame; missing source columns are treated as absent keys.

    Expects (any subset of): id, name, address, city, state, zip, phone_number,
    phone, email, open_website, website, url. Produces: id, name, address,
    city, state, zip, phone, email, website.
    """
    def col_or_null(name: str) -> Column:
        return F.col(name) if name in df.columns else F.lit(None).cast("string")

    def nz(c: Column) -> Column:
        # Python `or` treats '' as falsy -> coalesce over NULLIF(x, '')
        return F.nullif(c.cast("string"), F.lit(""))

    addr_src = F.coalesce(nz(col_or_null("address")), F.lit(""))
    city0 = F.trim(F.coalesce(nz(col_or_null("city")), F.lit("")))
    state0 = F.trim(F.coalesce(nz(col_or_null("state")), F.lit("")))
    zip0 = F.trim(F.coalesce(nz(col_or_null("zip")), F.lit("")))
    # sentinel cleanup before the extraction fallback (processor.py:330-335)
    city0 = F.when(F.lower(city0).isin("none", "nan", "null"), "").otherwise(city0)
    state0 = F.when(F.lower(state0).isin("none", "nan", "null"), "").otherwise(state0)
    zip0 = F.when(F.lower(zip0).isin("none", "nan", "null", ""), "").otherwise(zip0)

    need_extract = (city0 == "") | (state0 == "") | (zip0 == "")
    zip_f = F.when((zip0 == "") & need_extract, extract_zip_col(addr_src)).otherwise(zip0)
    city_f = F.when((city0 == "") & need_extract, extract_city_col(addr_src)).otherwise(city0)
    state_f = F.when((state0 == "") & need_extract, extract_state_col(addr_src)).otherwise(state0)

    out = df.select(
        col_or_null("id").alias("id"),
        F.trim(F.coalesce(col_or_null("name").cast("string"), F.lit(""))).alias("name"),
        F.trim(F.coalesce(nz(col_or_null("address")), F.lit(""))).alias("address"),
        city_f.alias("city"),
        state_f.alias("state"),
        zip_f.alias("zip"),
        F.trim(
            F.coalesce(nz(col_or_null("phone_number")), nz(col_or_null("phone")), F.lit(""))
        ).alias("phone"),
        F.trim(F.coalesce(nz(col_or_null("email")), F.lit(""))).alias("email"),
        F.trim(
            F.coalesce(
                nz(col_or_null("open_website")),
                nz(col_or_null("website")),
                nz(col_or_null("url")),
                F.lit(""),
            )
        ).alias("website"),
    )
    # final scrub across all string outputs (processor.py:416-424)
    scrubbed = [
        final_sentinel_scrub(F.col(c)).alias(c) if t == "string" else F.col(c)
        for c, t in out.dtypes
    ]
    return out.select(*scrubbed)


# --- html -> text extraction (Arrow pandas UDF) -----------------------------

_MAIN_RE = re.compile(r"<main>(.*)</main>", re.DOTALL)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Extract page text from the html payload — byte-identical per url to the
    stored `text` column (the input-hint invariant). Arrow-batched; the only
    Python-side work in the ingest stage.
    """
    def one(b) -> str | None:
        if b is None:
            return None
        s = bytes(b).decode("utf-8", errors="replace")
        m = _MAIN_RE.search(s)
        if m is None:
            return None
        return _htmllib.unescape(m.group(1))

    return html.map(one)


def ingest_pages(pages: DataFrame) -> DataFrame:
    """Ingest stage: extract text from html (falling back to the provided text
    column when html yields nothing) and normalize. Output adds
    `text_extracted` and `text_norm`. Text-only tables (no `html` column)
    skip the extraction UDF."""
    if "html" in pages.columns:
        out = pages.withColumn("text_extracted", extract_text_udf(F.col("html")))
    else:
        out = pages.withColumn(
            "text_extracted", F.lit(None).cast("string")
        )
    out = out.withColumn(
        "text_final", F.coalesce(F.col("text_extracted"), F.col("text"))
    )
    return out.withColumn("text_norm", normalize_text_col(F.col("text_final")))
