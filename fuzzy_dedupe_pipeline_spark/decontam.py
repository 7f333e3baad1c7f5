"""Benchmark decontamination: drop training documents that share any
word n-gram with an evaluation/benchmark set.

The standard LLM-pipeline guard (GPT-3 appendix C / Dolma / RedPajama use
13-gram overlap): before training, every document that contains an exact
n-gram also present in a held-out eval benchmark is flagged and removed, so
eval scores measure generalization rather than memorized test items.

Scale shape (the reason this is NOT a self-join): the eval side is tiny —
benchmarks are megabytes while the corpus is 100 TB. So:

  1. eval docs  -> distinct n-grams (a few million strings at most),
  2. training docs -> exploded n-grams, LEFT SEMI broadcast join against
     the eval grams — map-side hash probe, the 100 TB side never shuffles,
  3. hit doc_ids (small: only contaminated docs) -> distinct -> broadcast
     LEFT ANTI / flag join back onto the corpus — map-side again.

The only shuffle anywhere is the distinct over contaminated ids, which is
O(contaminated docs), not O(corpus). Both joins are plan-asserted broadcast
in tests/test_decontam.py.

Grams are compared as raw space-joined token strings so the DuckDB oracle
(__spark_entry__.oracle_sql) can reproduce them byte-identically; at real
scale pass hash_grams=True to probe on xxhash64(gram) instead — 8 bytes per
gram through the broadcast instead of ~80, same join shape.

Reference parity: the reference pipeline has no decontamination stage (it
dedups one contact table against itself, reference/dedupe_logic/processor.py);
this operator extends the same candidate-generation machinery to the
train-vs-eval direction a web-scale training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.textstats import tokens_simple


def ngram_strings(toks: Column, n: int) -> Column:
    """All overlapping word n-grams of a token array as space-joined strings
    (empty array when the doc has fewer than n tokens). Pure JVM higher-order
    functions — stays inside whole-stage codegen."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_grams(
    eval_docs: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the eval/benchmark set: one column `gram`.

    The distinct is a shuffle over the EVAL side only (tiny by construction);
    cache/broadcast the result when probing several corpus shards."""
    # explode_outer + null filter: plain explode infers size(grams)>0 and
    # pushes the full 13-gram construction below the spread exchange onto
    # the single-partition scan (see textstats.ngram_jaccard_pairs, r6)
    return (
        eval_docs.select(
            F.explode_outer(
                ngram_strings(tokens_simple(F.col(text_col)), n)
            ).alias("gram")
        )
        .filter(F.col("gram").isNotNull())
        .distinct()
    )


def contaminated_ids(
    docs: DataFrame,
    grams: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """doc_ids of training docs containing >= 1 eval n-gram, with the hit
    count per doc (`n_hits`, distinct grams matched).

    Join shape: explode is a map-side flatMap; the semi/inner join against
    the broadcast eval grams is a map-side hash probe (no corpus shuffle);
    the groupBy aggregates ONLY the hit rows."""
    probe = docs.select(
        F.col(id_col),
        F.explode_outer(
            ngram_strings(tokens_simple(F.col(text_col)), n)
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    if hash_grams:
        probe = probe.select(id_col, F.xxhash64("gram").alias("gram"))
        grams = grams.select(F.xxhash64("gram").alias("gram")).distinct()
    return (
        probe.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").cast("long").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """docs with a `contaminated` flag and the distinct-gram hit count
    (0 for clean docs). Filter `~contaminated` for the training split.

    The flag join broadcasts the contaminated-id list (small by the
    benchmark-is-tiny premise; if a corpus ever contaminates beyond the
    broadcast threshold, Spark's AQE falls back to a shuffled join and the
    semantics are unchanged)."""
    hits = contaminated_ids(
        docs, eval_grams(eval_docs, n, text_col), n, id_col, text_col,
        hash_grams,
    )
    return (
        docs.join(F.broadcast(hits), id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
