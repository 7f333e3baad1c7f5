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

import re
from collections import Counter
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Java \s (default, non-UNICODE_CHARACTER_CLASS) = [ \t\n\x0B\f\r]; spelled
# explicitly so the Python mirror of tokens_sql matches Java regex split for
# EVERY input, not just the ASCII corpus.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


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


def _family_stats(values: list[str]) -> tuple[int, int, int, int, int, int, int]:
    """(n, u, total_chars, dup_beyond_chars, dup_all_chars, top_cnt,
    top_chars) of a unit multiset — the exact quantities run_stats_sql's
    sorted fold computes (top ties broken toward larger char mass)."""
    n = len(values)
    if n == 0:
        return (0, 0, 0, 0, 0, 0, 0)
    cnt = Counter(values)
    tot = dupb = dupa = top_cnt = top_chars = 0
    for v, c in cnt.items():
        m = c * len(v)
        tot += m
        if c > 1:
            dupb += m - len(v)
            dupa += m
        if c > top_cnt:
            top_cnt, top_chars = c, m
        elif c == top_cnt and m > top_chars:
            top_chars = m
    return (n, len(cnt), tot, dupb, dupa, top_cnt, top_chars)


def _make_gopher_udf(grams_ns: tuple[int, ...]):
    """Arrow pandas UDF: text -> flat struct of every integer family stat
    (lines, paragraphs, one entry per gram order). Python mirrors the exact
    JVM semantics the SQL-HOF path uses: units split on literal newline runs
    then Spark-`trim` (ASCII space ONLY — verified empirically; NOT
    str.strip, which eats all whitespace), tokens split on Java \\s
    ([ \\t\\n\\x0B\\f\\r]+), grams joined by single spaces, char length =
    code points (Python len == Spark length for every valid string)."""
    fields = []
    for fam in ("ln", "pr"):
        fields += [
            T.StructField(f"{fam}_{p}", T.LongType(), False)
            for p in ("n", "u", "tot", "dupb")
        ]
    for n in grams_ns:
        fields += [
            T.StructField(f"g{n}_dupa", T.LongType(), False),
            T.StructField(f"g{n}_topc", T.LongType(), False),
        ]
    ret = T.StructType(fields)

    @F.pandas_udf(ret)
    def gopher_stats(texts: pd.Series) -> pd.DataFrame:
        out: dict[str, list[int]] = {f.name: [] for f in ret.fields}
        for text in texts:
            text = text or ""
            for fam, seps in (("ln", "\n"), ("pr", "\n\n")):
                units = [
                    u for u in (p.strip(" ") for p in text.split(seps)) if u
                ]
                n, u, tot, dupb, _dupa, _tc, _tch = _family_stats(units)
                out[f"{fam}_n"].append(n)
                out[f"{fam}_u"].append(u)
                out[f"{fam}_tot"].append(tot)
                out[f"{fam}_dupb"].append(dupb)
            toks = [t for t in _JAVA_WS.split(text) if t]
            for n in grams_ns:
                grams = (
                    [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                    if len(toks) >= n
                    else []
                )
                _n, _u, _tot, _dupb, dupa, _tc, topc = _family_stats(grams)
                out[f"g{n}_dupa"].append(dupa)
                out[f"g{n}_topc"].append(topc)
        return pd.DataFrame(out)

    return gopher_stats


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
    impl: str = "arrow",
) -> DataFrame:
    """Per-document Gopher repetition-rule signal table (see module doc for
    the exact character conventions). One map-only pass; the filtering
    decision a pipeline makes downstream is a plain range predicate over
    these columns (Gopher's published cuts are in the module docstring).

    impl='arrow' (default, r6): the 9 sort+fold families ran as INTERPRETED
    HigherOrderFunction trees — Catalyst allocates a 9-field struct and
    evaluates ~15 CASE branches per array element per family, which measured
    8.0s over 50k docs x 32 cores at sf1.0. The Arrow path computes the
    identical integer family stats per document in one pandas UDF (dict
    counting at C speed) and keeps the final fraction arithmetic in the SAME
    JVM expressions, so every output cell is value-identical
    (tests/test_repetition.py asserts arrow == sql on adversarial texts).
    impl='sql' keeps the pure-JVM map-only form (the 100 TB argument is
    unchanged: both are map-only, zero shuffle)."""
    if impl == "arrow":
        grams_ns = tuple(sorted(set(top_ns) | set(dup_ns)))
        udf = _make_gopher_udf(grams_ns)
        # NULL text -> NULL struct, matching the SQL-HOF path where every
        # family fold is NULL for NULL input (the UDF itself still sees the
        # row — Catalyst extracts Python UDFs below the CASE — but its
        # result is discarded for NULL rows)
        staged = df.select(
            F.col(id_col),
            F.length(F.col(text_col)).cast("long").alias("_doc_chars"),
            F.when(
                F.col(text_col).isNotNull(), udf(F.col(text_col))
            ).alias("_st"),
        )
        ln = F.col("_st")
        staged = staged.select(
            F.col(id_col),
            "_doc_chars",
            F.struct(
                ln["ln_n"].alias("n"),
                ln["ln_u"].alias("u"),
                ln["ln_tot"].alias("total_chars"),
                ln["ln_dupb"].alias("dup_beyond_chars"),
            ).alias("_ln"),
            F.struct(
                ln["pr_n"].alias("n"),
                ln["pr_u"].alias("u"),
                ln["pr_tot"].alias("total_chars"),
                ln["pr_dupb"].alias("dup_beyond_chars"),
            ).alias("_pr"),
            *[
                F.struct(
                    ln[f"g{n}_dupa"].alias("dup_all_chars"),
                    ln[f"g{n}_topc"].alias("top_chars"),
                ).alias(f"_g{n}")
                for n in grams_ns
            ],
        )
    else:
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
