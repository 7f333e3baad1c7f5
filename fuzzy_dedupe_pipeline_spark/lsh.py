"""LSH banding -> candidate pairs, with explicit hot-bucket skew handling.

Replaces the reference's FAISS exact top-k self-join
(dedupe_logic/processor.py:120-138). Banding is a pure equi-join Catalyst
plans (shuffle hash / sort-merge + AQE skew splitting); unlike the
reference's k=min(10,n) cap (processor.py:137), recall is governed by the
(bands x rows) S-curve: P(candidate | J=0.8) = 1-(1-0.8^4)^32 > 1 - 6e-8.

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
    """
    # bands feeds three plan branches (bucket sizes, both self-join sides);
    # persist so the signature chain upstream isn't re-executed per branch
    bands = band_table(sigs, cfg).persist()
    if persists is not None:
        persists.append(bands)
    sizes = bands.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    dropped = sizes.filter(F.col("bucket_size") > cfg.max_band_bucket)
    # hot buckets are few by construction -> broadcast anti-join
    ok = bands.join(
        F.broadcast(dropped.select("band_id", "band_hash")),
        ["band_id", "band_hash"],
        "left_anti",
    )

    left = ok.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id1")
    )
    right = ok.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id2")
    )
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id1") < F.col("id2"))  # reference J2 ordered-pair guard
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])  # multi-band collisions (reference J2 set)
    )
    return pairs, dropped
