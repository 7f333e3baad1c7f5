"""Corpus-level boilerplate line removal (line-granularity dedup).

Web pages share lines — nav bars, cookie banners, footers — that survive
HTML extraction and poison near-dup detection (they inflate Jaccard between
unrelated pages) and LLM training data (the model memorizes them). The
standard fix (CCNet / RefinedWeb style) is: a line that occurs in at least
`min_docs` *distinct* documents is boilerplate; delete it from every document
it appears in, preserving the order of the surviving lines.

Dataflow (designed for 10^12 docs):

  1. frequent_lines: per-doc DISTINCT lines exploded -> groupBy(line) count.
     One shuffle; partial aggregation collapses the heavy hitters map-side,
     which is exactly where boilerplate mass is. The survivor set is bounded
     by total_lines / min_docs (a heavy-hitter bound), so with a corpus-
     proportional threshold it stays tiny no matter the corpus size.
  2. remove_boilerplate: the survivor set is collected into ONE array and
     broadcast; each doc filters its own line array map-side with
     F.filter + array_contains — order preserved for free, no explode, no
     second shuffle, no re-assembly join.

  If an absolute (non-proportional) threshold ever makes the survivor set
  too big to broadcast, the fallback shape is posexplode -> broadcast
  left_anti join on line -> groupBy(doc) sort_array(struct(pos,line))
  reconstruct: two shuffles, unbounded set. The default stays the broadcast
  form because the threshold SHOULD be corpus-proportional (a line in 0.01%
  of a 10^12-doc corpus is still boilerplate; a line in 50 docs is not).

The reference has no line concept (spreadsheet rows); this operator exists
for the north-rule webtext payload. Parity: `remove_boilerplate` has an
exact DuckDB twin in __spark_entry__.oracle_sql (unnest + HAVING + lambda
list_filter), checked value-level by the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lines_col(c: Column, sep: str = "\n") -> Column:
    """Split into lines, trimmed, empties dropped — the unit of dedup.
    NULL text -> empty array (not NULL: downstream size()/filter() must see
    0 lines, never SQL-NULL's -1/NULL propagation).

    sep is a LITERAL separator (quoted with \\Q..\\E before it reaches
    F.split's regex argument): callers rejoin with the same sep via
    concat_ws, which is literal — treating it as a regex here would make a
    metacharacter sep (e.g. '|' or '.') explode docs per-character and
    silently rebuild garbage."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(c, F.lit("")), "\\Q" + sep + "\\E"),
            lambda l: F.trim(l),
        ),
        lambda l: l != "",
    )


def frequent_lines(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 100,
) -> DataFrame:
    """Lines occurring in >= min_docs distinct documents -> (line, n_docs).

    array_distinct BEFORE the explode makes count(*) a distinct-doc count
    without a shuffle-heavy countDistinct, and caps each doc's contribution
    at 1 regardless of how often it repeats the line internally.
    """
    return (
        docs.select(
            F.explode_outer(F.array_distinct(lines_col(F.col(text_col), sep))).alias(
                "line"
            )
        )
        .groupBy("line")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 100,
) -> DataFrame:
    """-> (id_col, text_clean, n_lines, n_removed) with boilerplate lines
    (>= min_docs distinct docs) deleted, surviving-line order preserved.

    Docs whose every line is boilerplate survive with text_clean = ''.
    """
    boiler = frequent_lines(docs, text_col, sep, min_docs).agg(
        F.array_sort(F.collect_list("line")).alias("_boiler")
    )
    lines = lines_col(F.col(text_col), sep)
    kept = F.filter(lines, lambda l: ~F.array_contains(F.col("_boiler"), l))
    return (
        docs.crossJoin(F.broadcast(boiler))
        .select(
            id_col,
            F.concat_ws(sep, kept).alias("text_clean"),
            F.size(lines).cast("long").alias("n_lines"),
            (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"),
        )
    )
