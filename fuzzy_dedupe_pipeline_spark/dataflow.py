"""Lazy (non-materializing) composition of the dedup dataflow.

Same stages as pipeline.DedupePipeline but returning DataFrames without
writing checkpoints — the shape used by __spark_entry__ queries and bench.py.
DedupePipeline remains the production path (resumable, metrics); this is the
ad-hoc/query path. Both call the identical stage modules, so semantics cannot
diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.canonical import cluster_output
from fuzzy_dedupe_pipeline_spark.cc import attach_singletons, connected_components
from fuzzy_dedupe_pipeline_spark.config import DEFAULT_CONFIG, DedupeConfig
from fuzzy_dedupe_pipeline_spark.lsh import candidate_pairs
from fuzzy_dedupe_pipeline_spark.minhash import simhash_similarity_col, with_signatures
from fuzzy_dedupe_pipeline_spark.normalize import normalize_text_col, tokens_raw_col
from fuzzy_dedupe_pipeline_spark.substring import substring_candidates
from fuzzy_dedupe_pipeline_spark.verify import verify_pairs


def clean_docs(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, text_final, text_norm) from any (id, text) table."""
    return docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text_final"),
        normalize_text_col(F.col(text_col)).alias("text_norm"),
    )


def exact_edges_df(clean: DataFrame) -> DataFrame:
    """Star edges rep->member over identical normalized text (exact dedup)."""
    keyed = clean.select("id", F.sha2(F.col("text_norm"), 256).alias("tkey"))
    reps = keyed.groupBy("tkey").agg(F.min("id").alias("rep"))
    return (
        keyed.join(reps, "tkey")
        .filter(F.col("id") != F.col("rep"))
        .select(
            F.col("rep").alias("id1"),
            F.col("id").alias("id2"),
            F.lit(1.0).alias("confidence"),
            F.lit("exact").alias("match_type"),
        )
    )


def dedupe_edges(
    clean_reps: DataFrame, cfg: DedupeConfig, with_substring: bool = True
) -> DataFrame:
    """Verified near-dup edges among exact-representatives."""
    sigs = with_signatures(
        clean_reps.select(F.col("id").alias("url"), "text_norm"),
        cfg,
        id_col="url",
        text_col="text_norm",
    ).persist()
    lsh_pairs, _ = candidate_pairs(sigs, cfg)
    if with_substring:
        toks = clean_reps.select(
            "id", tokens_raw_col(F.col("text_norm")).alias("tokens")
        )
        sub_pairs, _ = substring_candidates(toks, cfg)
    else:
        sub_pairs = lsh_pairs.limit(0)
    return verify_pairs(lsh_pairs, sub_pairs, sigs, cfg)


def dedupe_clusters(
    spark: SparkSession,
    docs: DataFrame,
    cfg: DedupeConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    with_substring: bool = True,
    rebalance_input: bool = True,
) -> DataFrame:
    """Full flagship flow on any (id, text) table ->
    clusters(url, cluster_id, confidence_score, duplicate_count,
    is_representative).

    rebalance_input round-robin-repartitions the corpus to the session's
    default parallelism before the signature stages. Source layout is not to
    be trusted: a single unsplittable parquet row group puts EVERY row in one
    partition and serializes all three Arrow-UDF passes onto one core (file
    splits exist but only the one containing the row-group start gets rows).
    One cheap shuffle of the text buys guaranteed balance; disable it only
    when the input is known well-partitioned (e.g. a bucketed Iceberg table).
    """
    clean = clean_docs(docs, id_col, text_col)
    if rebalance_input:
        clean = clean.repartition(spark.sparkContext.defaultParallelism)
    clean = clean.persist()
    exact = exact_edges_df(clean).persist()
    reps = clean.join(
        exact.select(F.col("id2").alias("id")), "id", "left_anti"
    )
    near = dedupe_edges(reps, cfg, with_substring=with_substring).persist()
    all_edges = near.select("id1", "id2", "confidence").union(
        exact.select("id1", "id2", "confidence")
    )
    labels = connected_components(
        all_edges.select("id1", "id2"), max_iters=cfg.cc_max_iters
    )
    members = attach_singletons(clean.select("id"), labels)
    return cluster_output(members, all_edges, clean.select("id", "text_final"))


def simhash_near_dup_pairs(
    clean: DataFrame, cfg: DedupeConfig, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole banding (hamming <= d => at least one
    of d+1 bit-chunks equal) -> equi-join candidates -> exact hamming filter.
    Returns (id1, id2, hamming, simhash_sim)."""
    sigs = with_signatures(
        clean.select(F.col("id").alias("url"), "text_norm"),
        cfg,
        id_col="url",
        text_col="text_norm",
    ).filter(F.size("shingles") > 0)
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = sigs.select(
        F.col("id"), F.col("simhash"), F.explode(chunks).alias("c")
    ).select("id", "simhash", "c.chunk_id", "c.chunk_val")
    a = banded.select(
        "chunk_id", "chunk_val", F.col("id").alias("id1"), F.col("simhash").alias("s1")
    )
    b = banded.select(
        "chunk_id", "chunk_val", F.col("id").alias("id2"), F.col("simhash").alias("s2")
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .dropDuplicates(["id1", "id2"])
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"),
            F.round(simhash_similarity_col(F.col("s1"), F.col("s2")), 6).alias(
                "simhash_sim"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
