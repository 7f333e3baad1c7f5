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
  2. remove_boilerplate: docs posexplode into (pos, line) rows, a broadcast
     LEFT ANTI hash join against the frequent-lines table drops boilerplate
     (O(1) hash probe per line, the survivor relation lives in the join's
     broadcast hash map — never a single giant array row), and the doc is
     reassembled with a position-ordered collect_list. A per-doc NULL
     sentinel row rides through the anti join (NULL keys never match) so
     docs whose every line was boilerplate still come back, with
     text_clean = '' (array_join skips NULL elements).

  A map-side variant (impl="broadcast_array": the survivor set collected
  into ONE array row, crossJoin-broadcast, per-line array_contains) is kept
  for the tiny-set regime — no explode, no reassembly shuffle — but it scans
  the whole array per line and holds the set as one row, so it is NOT the
  default: with an absolute (non-proportional) min_docs the survivor set is
  unbounded, and boilerplate is exactly where frequent-line mass explodes.
  If the set ever outgrows the broadcast threshold entirely, flipping the
  anti join to sort-merge is Spark's own fallback — the join form degrades
  gracefully where the array form OOMs the driver.

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
    impl: str = "anti_join",
) -> DataFrame:
    """-> (id_col, text_clean, n_lines, n_removed) with boilerplate lines
    (>= min_docs distinct docs) deleted, surviving-line order preserved.

    Docs whose every line is boilerplate survive with text_clean = ''.
    Both impls compute identical rows (test_impls_agree); see the module
    docstring for the shape trade-off.
    """
    freq = frequent_lines(docs, text_col, sep, min_docs)
    lines = lines_col(F.col(text_col), sep)
    if impl == "broadcast_array":
        boiler = freq.agg(F.array_sort(F.collect_list("line")).alias("_boiler"))
        kept = F.filter(lines, lambda l: ~F.array_contains(F.col("_boiler"), l))
        return docs.crossJoin(F.broadcast(boiler)).select(
            id_col,
            F.concat_ws(sep, kept).alias("text_clean"),
            F.size(lines).cast("long").alias("n_lines"),
            (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"),
        )
    if impl != "anti_join":
        raise ValueError(f"unknown impl: {impl!r}")
    # anti_join: explode with position, drop boilerplate via broadcast hash
    # anti join, reassemble position-ordered. The appended NULL element is a
    # per-doc sentinel: posexplode gives it pos = n_kept-agnostic last index,
    # a NULL join key never matches (anti join keeps it), count(_line) and
    # array_join both skip NULLs — so every doc reaches the groupBy even when
    # the anti join removed all its real lines, at zero extra shuffle.
    ex = docs.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        # posexplode_OUTER: the concat array is never empty/NULL so outer
        # emits identical rows, but the non-outer form makes
        # InferFiltersFromGenerate push a size()>0 predicate below the
        # spread exchange, re-running the whole line split at the scan
        # (the §7 trap in OPTIMIZATION_r06.md).
        F.posexplode_outer(
            F.concat(lines, F.array(F.lit(None).cast("string")))
        ).alias("_pos", "_line"),
    )
    kept = ex.join(
        F.broadcast(freq.select(F.col("line").alias("_line"))),
        on="_line",
        how="left_anti",
    )
    return (
        kept.groupBy(id_col, "n_lines")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
                    ),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("text_clean"),
            F.count("_line").cast("long").alias("_n_kept"),
        )
        .select(
            id_col,
            "text_clean",
            "n_lines",
            (F.col("n_lines") - F.col("_n_kept")).cast("long").alias("n_removed"),
        )
    )
