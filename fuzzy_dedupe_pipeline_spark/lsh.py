"""LSH banding -> candidate pairs, with explicit hot-bucket skew handling.

Replaces the reference's FAISS exact top-k self-join
(dedupe_logic/processor.py:120-138). Banding hash-partitions the band table
by (band_id, band_hash) once and enumerates pairs inside each bucket
(value-identical to the former band self-join, one exchange instead of
three); unlike the reference's k=min(10,n) cap (processor.py:137), recall is
governed by the (bands x rows) S-curve:
P(candidate | J=0.8) = 1-(1-0.8^4)^32 > 1 - 6e-8.

Skew: boilerplate-heavy corpora produce hot (band_id, band_hash) buckets whose
pair blowup is O(m^2). Buckets larger than cfg.max_band_bucket are excluded
from pair generation and *logged* (returned as a dropped-buckets DataFrame the
pipeline writes to metrics) — the north rule's explicit skew handling. Exact
duplicates never reach here (the pipeline collapses them first), so oversized
buckets are genuinely pathological keys, not normal data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.minhash import band_hashes_col


def band_table(sigs: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """(id, band_id, band_hash) — one row per band per doc. Docs with no
    shingles are excluded (their all-MAX signatures would all collide);
    n_tokens == 0 iff the shingle set is empty, and unlike the shingle
    array it is present in the narrow cached signature table."""
    return (
        sigs.filter(F.col("n_tokens") > 0)
        .select(
            "id",
            F.posexplode(band_hashes_col(F.col("minhash"), cfg)).alias(
                "band_id", "band_hash"
            ),
        )
    )


def candidate_pairs(
    sigs: DataFrame, cfg: DedupeConfig, persists: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """LSH candidates: (id1, id2) with id1 < id2, distinct across bands.

    Returns (pairs, dropped_buckets) where dropped_buckets is
    (band_id, band_hash, bucket_size) for every bucket excluded by the skew
    cap — the caller persists it to the metrics/lineage table.

    persists: caller-owned registry — every frame this function persists is
    appended so the caller can unpersist once results are materialized
    (long-lived sessions: streaming micro-batches, repeated bench runs).

    Shape (r6): ONE shuffle of the band table. The old form (bucket-size
    aggregate + broadcast anti-join + band self-join) moved the 32x-corpus
    band rows through three exchanges to emit a pair set that is tiny after
    exact-dedup; grouping each (band_id, band_hash) bucket once and
    enumerating in-bucket pairs from the sorted id array produces the
    identical (id1 < id2, distinct) set with a single hash exchange plus
    the pair distinct. The bucket arrays are bounded by cfg.max_band_bucket
    (oversized buckets are dropped BEFORE enumeration, exactly as before),
    so per-task state is O(cap), and a bucket's pairs were produced by one
    task under the equi-join too — same skew profile, same cap control.
    """
    buckets = (
        band_table(sigs, cfg)
        .groupBy("band_id", "band_hash")
        .agg(
            F.array_sort(F.collect_list("id")).alias("ids"),
            F.count("*").alias("bucket_size"),
        )
        .persist()
    )
    if persists is not None:
        persists.append(buckets)
    dropped = buckets.filter(
        F.col("bucket_size") > cfg.max_band_bucket
    ).select("band_id", "band_hash", "bucket_size")
    ok = buckets.filter(
        (F.col("bucket_size") <= cfg.max_band_bucket)
        & (F.col("bucket_size") >= 2)
    )
    # Enumerate ordered pairs per bucket: for every j >= 1, id2 = ids[j]
    # pairs with each id1 in ids[0..j-1] — with ids ascending (array_sort's
    # string ordering is the same binary comparison as the `<` operator and
    # ids are distinct within a bucket), this is exactly {id1 < id2}
    # (reference J2 ordered-pair guard). slice keeps per-row state O(bucket),
    # never a flattened O(bucket^2) array. Outer explodes: both arrays are
    # provably non-empty, and the non-outer form would make
    # InferFiltersFromGenerate push size()>0 predicates below the exchange.
    ex2 = ok.select(
        "ids", F.posexplode_outer("ids").alias("_j", "id2")
    ).filter(F.col("_j") >= 1)
    pairs = (
        ex2.select(
            F.explode_outer(F.slice("ids", 1, F.col("_j"))).alias("id1"), "id2"
        )
        .dropDuplicates(["id1", "id2"])  # multi-band collisions (reference J2 set)
        .select("id1", "id2")
    )
    return pairs, dropped
