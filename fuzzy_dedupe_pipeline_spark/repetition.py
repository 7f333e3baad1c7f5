"""Gopher/MassiveText repetition-rule signals — the character-fraction set.

textstats.repetition_stats already gives the cheap count ratios
(1 - distinct/total over tokens and bigrams). This module adds the rest of
the published Gopher repetition table (Rae et al. 2021, Table A1), the
signals web pipelines actually threshold on:

  * duplicate line / paragraph fraction            (cut at 0.30)
  * duplicate line / paragraph CHARACTER fraction  (cut at 0.20)
  * top n-gram character fraction, n = 2..4        (cut at 0.20/0.18/0.16)
  * duplicate n-gram character fraction, n = 5..10 (cut at 0.15..0.10)

Character conventions (documented because Gopher's prose is ambiguous and
implementations differ):
  * line/paragraph char fraction counts characters of occurrences BEYOND the
    first (a line seen 3x contributes 2x its length), over total unit chars;
  * duplicate n-gram char fraction counts ALL occurrences of any gram seen
    more than once (count x len), over the document's character length;
  * top n-gram char fraction is count x len of the most frequent gram (ties
    broken toward the larger character mass), over the document's character
    length.

Scale design (the whole point): every signal is a function of ONE document,
so the 100 TB plan is map-only — NO shuffle, NO Python. An explode ->
groupBy(doc, unit) formulation would shuffle every token of the corpus;
instead each unit array is array_sort()ed per row and folded with ONE linear
F.aggregate run-scan whose struct accumulator carries (open-run length,
distinct count, duplicate char mass, argmax char mass). Per-row cost is
O(units log units); cluster cost is a single scan over the corpus.

The reference (a single-process contact-dedupe script, reference/main.py)
has no quality model; this operator exists for the north-rule webtext
payload. The DuckDB oracle in __spark_entry__ re-derives every signal
through the independent unnest + GROUP BY + window-max route, so the two
plans (map-only HOF vs relational) must agree value-exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_simple


def token_ngrams(toks: Column, n: int) -> Column:
    """Adjacent-token n-grams joined by single spaces; arrays shorter than n
    yield an empty array (F.sequence would otherwise count DOWN from 1)."""
    size = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), size - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def split_units(c: Column, sep: str) -> Column:
    """Non-empty trimmed units of a text column split on a literal separator
    (lines on '\\n', paragraphs on '\\n\\n')."""
    parts = F.split(c, _re_escape(sep))
    # NB: the explicit single-arg lambda matters — F.trim has an optional
    # second parameter, so passing it bare makes transform() hand it the
    # element INDEX as the trim-character set (nothing gets trimmed).
    return F.filter(F.transform(parts, lambda x: F.trim(x)), lambda x: x != "")


def _re_escape(sep: str) -> str:
    # F.split takes a Java regex; our separators are newline runs only.
    return sep.replace("\n", r"\n")


def _zero() -> Column:
    # built lazily: F.lit needs an active SparkContext, import time has none
    return F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("u"),
        F.lit(0).cast("long").alias("dupb"),
        F.lit(0).cast("long").alias("dupa"),
        F.lit(0).cast("long").alias("top_cnt"),
        F.lit(0).cast("long").alias("top_chars"),
    )


def _close(acc: Column, closing: Column) -> tuple[Column, ...]:
    """Accumulator fields after (conditionally) closing the open run."""
    runlen = acc["cur"]
    runchars = runlen * F.length(acc["prev"])
    dup_run = closing & (runlen > 1)
    new_top = closing & (runlen > acc["top_cnt"])
    tie_top = closing & (runlen == acc["top_cnt"])
    u = (acc["u"] + F.when(closing, 1).otherwise(0)).cast("long")
    dupb = (
        acc["dupb"]
        + F.when(dup_run, (runlen - 1) * F.length(acc["prev"])).otherwise(0)
    ).cast("long")
    dupa = (acc["dupa"] + F.when(dup_run, runchars).otherwise(0)).cast("long")
    top_cnt = F.when(new_top, runlen).otherwise(acc["top_cnt"]).cast("long")
    top_chars = (
        F.when(new_top, runchars)
        .when(tie_top, F.greatest(acc["top_chars"], runchars))
        .otherwise(acc["top_chars"])
        .cast("long")
    )
    return u, dupb, dupa, top_cnt, top_chars


def run_stats(arr: Column) -> Column:
    """Multiplicity stats of an array's values from one sort + one linear
    fold — map-only, no explode, no shuffle.

    Returns struct(n, u, total_chars, dup_beyond_chars, dup_all_chars,
    top_cnt, top_chars): element count, distinct count, total char mass,
    char mass of occurrences beyond the first, char mass of all occurrences
    of duplicated values, the max multiplicity, and count x len of the most
    frequent value (ties -> larger char mass)."""

    def merge(acc: Column, x: Column) -> Column:
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        u, dupb, dupa, top_cnt, top_chars = _close(
            acc, (~same) & (acc["cur"] > 0)
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cur"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
            .alias("cur"),
            u.alias("u"),
            dupb.alias("dupb"),
            dupa.alias("dupa"),
            top_cnt.alias("top_cnt"),
            top_chars.alias("top_chars"),
        )

    def finish(acc: Column) -> Column:
        u, dupb, dupa, top_cnt, top_chars = _close(acc, acc["cur"] > 0)
        return F.struct(
            u.alias("u"),
            dupb.alias("dup_beyond_chars"),
            dupa.alias("dup_all_chars"),
            top_cnt.alias("top_cnt"),
            top_chars.alias("top_chars"),
        )

    folded = F.aggregate(F.array_sort(arr), _zero(), merge, finish)
    return F.struct(
        F.size(arr).cast("long").alias("n"),
        folded["u"].alias("u"),
        F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("total_chars"),
        folded["dup_beyond_chars"].alias("dup_beyond_chars"),
        folded["dup_all_chars"].alias("dup_all_chars"),
        folded["top_cnt"].alias("top_cnt"),
        folded["top_chars"].alias("top_chars"),
    )


def _frac(num: Column, den: Column) -> Column:
    """round(num/den, 6) with a 0.0 guard — both engines divide the same two
    exact integers, so the doubles (and the 6dp rounding) agree bit-for-bit."""
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document Gopher repetition-rule signal table (see module doc for
    the exact character conventions). One map-only pass; the filtering
    decision a pipeline makes downstream is a plain range predicate over
    these columns (Gopher's published cuts are in the module docstring)."""
    text = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("_doc_chars"),
        run_stats(split_units(text, "\n")).alias("_ln"),
        run_stats(split_units(text, "\n\n")).alias("_pr"),
        tokens_simple(text).alias("_toks"),
    )
    gram_cols = [
        run_stats(token_ngrams(F.col("_toks"), n)).alias(f"_g{n}")
        for n in sorted(set(top_ns) | set(dup_ns))
    ]
    staged = staged.select(
        id_col, "_doc_chars", "_ln", "_pr", *gram_cols
    )
    ln, pr = F.col("_ln"), F.col("_pr")
    out = [
        F.col(id_col),
        ln["n"].alias("n_lines"),
        _frac(ln["n"] - ln["u"], ln["n"]).alias("dup_line_frac"),
        _frac(ln["dup_beyond_chars"], ln["total_chars"]).alias(
            "dup_line_char_frac"
        ),
        pr["n"].alias("n_paras"),
        _frac(pr["n"] - pr["u"], pr["n"]).alias("dup_para_frac"),
        _frac(pr["dup_beyond_chars"], pr["total_chars"]).alias(
            "dup_para_char_frac"
        ),
    ]
    for n in top_ns:
        g = F.col(f"_g{n}")
        out.append(
            _frac(g["top_chars"], F.col("_doc_chars")).alias(
                f"top_{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        g = F.col(f"_g{n}")
        out.append(
            _frac(g["dup_all_chars"], F.col("_doc_chars")).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    return staged.select(*out)
