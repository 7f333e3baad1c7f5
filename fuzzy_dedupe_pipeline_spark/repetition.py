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
run-scan whose struct accumulator carries (open-run length, distinct count,
duplicate char mass, argmax char mass, element count, char mass). Per-row
cost is O(units log units); cluster cost is a single scan over the corpus.

Construction note: each family's sort+fold is generated as ONE SQL
expression string handed to a single expr() call, not composed from
pyspark.sql.functions Column objects. The semantics are identical (it is
the same Catalyst HigherOrderFunction tree after parsing); the difference
is driver-side cost — the Column-object composition of 11 deep fold trees
cost ~3 s of py4j round-trips PER QUERY CONSTRUCTION (measured, sf-
independent), which dominated the query's 1.2 s of actual cluster work.
One parse call per family cuts construction to milliseconds. Execution
plans are byte-identical in shape: map-only, zero shuffle, no Python.

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


def ngrams_sql(toks: str, n: int) -> str:
    """SQL expr: adjacent-token n-grams of a token-array expression, joined
    by single spaces; arrays shorter than n yield an empty array (sequence()
    would otherwise count DOWN from 1)."""
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def units_sql(text: str, newlines: int) -> str:
    """SQL expr: non-empty trimmed units of a text expression split on a run
    of `newlines` newline characters (1 = lines, 2 = paragraphs). The split
    pattern is a string literal containing literal newline chars — as a Java
    regex they match exactly the same places as the escaped \\n form."""
    sep = "\n" * newlines
    return (
        f"filter(transform(split({text}, '{sep}'), x -> trim(x)), "
        f"x -> x != '')"
    )


def tokens_sql(text: str) -> str:
    """SQL expr: whitespace tokens, matching textstats.tokens_simple
    (split on \\s+ then drop empties)."""
    return rf"filter(split({text}, '\\s+'), x -> x != '')"


def run_stats_sql(arr: str) -> str:
    """SQL expr: multiplicity stats of an array expression's values from one
    sort + one linear fold — map-only, no explode, no shuffle.

    Evaluates to struct(n, u, total_chars, dup_beyond_chars, dup_all_chars,
    top_cnt, top_chars): element count, distinct count, total char mass,
    char mass of occurrences beyond the first, char mass of all occurrences
    of duplicated values, the max multiplicity, and count x len of the most
    frequent value (ties -> larger char mass).

    The fold also accumulates n and total_chars (same multiset before and
    after array_sort), so the WHOLE stat struct is one aggregate() — no
    second pass over the array and no duplicated subtree in the plan."""
    same = "(acc.prev IS NOT NULL AND x = acc.prev)"
    closing = f"((NOT {same}) AND acc.cur > 0)"
    runchars = "(acc.cur * length(acc.prev))"
    dup_run = f"({closing} AND acc.cur > 1)"
    new_top = f"({closing} AND acc.cur > acc.top_cnt)"
    tie_top = f"({closing} AND acc.cur = acc.top_cnt)"
    zero = (
        "named_struct("
        "'prev', CAST(NULL AS STRING), 'cur', CAST(0 AS BIGINT), "
        "'u', CAST(0 AS BIGINT), 'dupb', CAST(0 AS BIGINT), "
        "'dupa', CAST(0 AS BIGINT), 'top_cnt', CAST(0 AS BIGINT), "
        "'top_chars', CAST(0 AS BIGINT), 'cnt', CAST(0 AS BIGINT), "
        "'chars', CAST(0 AS BIGINT))"
    )
    merge = f"""(acc, x) -> named_struct(
      'prev', x,
      'cur', CAST(CASE WHEN {same} THEN acc.cur + 1 ELSE 1 END AS BIGINT),
      'u', CAST(acc.u + (CASE WHEN {closing} THEN 1 ELSE 0 END) AS BIGINT),
      'dupb', CAST(acc.dupb + (CASE WHEN {dup_run}
               THEN (acc.cur - 1) * length(acc.prev) ELSE 0 END) AS BIGINT),
      'dupa', CAST(acc.dupa + (CASE WHEN {dup_run}
               THEN {runchars} ELSE 0 END) AS BIGINT),
      'top_cnt', CAST(CASE WHEN {new_top} THEN acc.cur
                 ELSE acc.top_cnt END AS BIGINT),
      'top_chars', CAST(CASE WHEN {new_top} THEN {runchars}
                   WHEN {tie_top} THEN greatest(acc.top_chars, {runchars})
                   ELSE acc.top_chars END AS BIGINT),
      'cnt', CAST(acc.cnt + 1 AS BIGINT),
      'chars', CAST(acc.chars + length(x) AS BIGINT))"""
    f_closing = "(acc.cur > 0)"
    f_dup = f"({f_closing} AND acc.cur > 1)"
    f_new = f"({f_closing} AND acc.cur > acc.top_cnt)"
    f_tie = f"({f_closing} AND acc.cur = acc.top_cnt)"
    finish = f"""acc -> named_struct(
      'n', acc.cnt,
      'u', CAST(acc.u + (CASE WHEN {f_closing} THEN 1 ELSE 0 END) AS BIGINT),
      'total_chars', acc.chars,
      'dup_beyond_chars', CAST(acc.dupb + (CASE WHEN {f_dup}
               THEN (acc.cur - 1) * length(acc.prev) ELSE 0 END) AS BIGINT),
      'dup_all_chars', CAST(acc.dupa + (CASE WHEN {f_dup}
               THEN {runchars} ELSE 0 END) AS BIGINT),
      'top_cnt', CAST(CASE WHEN {f_new} THEN acc.cur
                 ELSE acc.top_cnt END AS BIGINT),
      'top_chars', CAST(CASE WHEN {f_new} THEN {runchars}
                   WHEN {f_tie} THEN greatest(acc.top_chars, {runchars})
                   ELSE acc.top_chars END AS BIGINT))"""
    return f"aggregate(array_sort({arr}), {zero}, {merge}, {finish})"


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
    tid, ttx = f"`{id_col}`", f"`{text_col}`"
    staged = df.selectExpr(
        tid,
        f"CAST(length({ttx}) AS BIGINT) AS _doc_chars",
        f"{run_stats_sql(units_sql(ttx, 1))} AS _ln",
        f"{run_stats_sql(units_sql(ttx, 2))} AS _pr",
        f"{tokens_sql(ttx)} AS _toks",
    )
    gram_exprs = [
        f"{run_stats_sql(ngrams_sql('_toks', n))} AS _g{n}"
        for n in sorted(set(top_ns) | set(dup_ns))
    ]
    staged = staged.selectExpr(tid, "_doc_chars", "_ln", "_pr", *gram_exprs)
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
