"""Bucketed signature/band tables — the Iceberg-table analog (SURVEY §4 #1c).

The north rule stores LSH band rows in Iceberg tables bucketed by band_hash so
the candidate self-join is co-located (no shuffle at read time). No Iceberg
jars exist in this sandbox, so the same physical property is realized with
Spark's native bucketed tables (`bucketBy().sortBy().saveAsTable()`): each
bucket's rows land in fixed files by hash(band_hash), the catalog records the
bucket spec, and a self-join on band_hash reads both sides pre-partitioned —
Catalyst plans a SortMergeJoin with NO Exchange on either side
(asserted in tests/test_plans.py::test_bucketed_band_self_join_no_shuffle).

Mapping to production Iceberg:
  saveAsTable(bucketBy)     -> CREATE TABLE ... PARTITIONED BY (bucket(N, band_hash))
  mode('overwrite')         -> atomic REPLACE TABLE snapshot commit
  catalog lookup            -> Iceberg catalog; hidden-partition pruning replaces
                               Spark's bucket-spec handshake

band_hash alone is the join key here: the band index is already folded into
the hash (minhash.band_hashes_col computes xxhash64(band_id, slice)), so
joining on band_hash finds the same candidates as (band_id, band_hash) modulo
64-bit collisions — which the Jaccard verify stage filters anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.lsh import band_table


def save_bucketed_bands(
    sigs: DataFrame,
    cfg: DedupeConfig,
    table: str = "lsh_bands",
    n_buckets: int = 32,
) -> None:
    """Materialize the (id, band_id, band_hash) index bucketed by band_hash.

    Overwrite is a catalog-level swap (the Iceberg REPLACE TABLE analog);
    n_buckets should be sized so one bucket's candidate pairs fit an executor
    (at 10^12 docs: thousands of buckets, not 32).
    """
    (
        band_table(sigs, cfg)
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_candidate_pairs(
    spark: SparkSession, cfg: DedupeConfig, table: str = "lsh_bands"
) -> DataFrame:
    """LSH candidate pairs from the bucketed band table — co-located
    self-join on band_hash (zero-shuffle read path), same hot-bucket cap and
    ordered-pair/dedup semantics as lsh.candidate_pairs."""
    bands = spark.table(table)
    sizes = bands.groupBy("band_hash").agg(F.count("*").alias("bucket_size"))
    hot = sizes.filter(F.col("bucket_size") > cfg.max_band_bucket)
    ok = bands.join(
        F.broadcast(hot.select("band_hash")), ["band_hash"], "left_anti"
    )
    left = ok.select("band_hash", F.col("id").alias("id1"))
    right = ok.select("band_hash", F.col("id").alias("id2"))
    return (
        left.join(right, ["band_hash"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
