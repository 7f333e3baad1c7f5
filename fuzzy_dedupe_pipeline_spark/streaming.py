"""Structured Streaming incremental dedup — new pages vs everything seen.

The batch pipeline answers "cluster this corpus"; a crawl is a *stream* of
dumps, and re-clustering 100 TB per dump is not an option. This module
processes arriving pages incrementally: each micro-batch is signed with the
SAME MinHash/SimHash config as the batch path (identical semantics by
construction — both call minhash.with_signatures / verify.verify_pairs),
matched against a persistent signature store of all prior docs, and assigned
a cluster id.

Shape: `readStream` (file source) -> `foreachBatch`. foreachBatch is the
idiomatic choice here — dedup state is a corpus-wide *signature index* joined
by LSH band keys, not per-key state, so `applyInPandasWithState` (keyed state)
is the wrong primitive.

State layout under state_dir (parquet; Iceberg-table analog — at production
scale these are Iceberg tables bucketed by band_hash and the label rewrite is
a MERGE INTO):
  sigs/    append-only (id, n_tokens, shingles, minhash, simhash)
  bands/   append-only (id, band_id, band_hash) — the LSH index
  labels/  (id, cluster_id) — rewritten per batch (small; one row per doc)

Per batch:
  1. sign batch docs (Arrow UDF, same cfg)
  2. candidates = intra-batch LSH pairs  UNION  batch-bands x store-bands
     equi-join (batch side broadcast — micro-batches are small by definition)
  3. verify exactly as batch path (Jaccard + SimHash cascade)
  4. labels: old endpoints are first rewritten to their existing cluster_id,
     then min-label connected components run over the (tiny) batch subgraph —
     so a new doc bridging two existing clusters merges them (their labels
     rewrite in the store), preserving the batch pipeline's global invariant:
     cluster_id == min id of the connected component.
  5. append sigs+bands, overwrite labels, emit (id, cluster_id, batch_id)

Exactly-once: the file-source checkpoint gives at-least-once foreachBatch
execution; state appends are idempotent per batch only if the job isn't
killed mid-write — production hardening is Iceberg atomic commits keyed by
batch_id (noted, not emulated in the sandbox).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.cc import attach_singletons, connected_components
from fuzzy_dedupe_pipeline_spark.config import DEFAULT_CONFIG, DedupeConfig
from fuzzy_dedupe_pipeline_spark.dataflow import clean_docs
from fuzzy_dedupe_pipeline_spark.lsh import band_table, candidate_pairs
from fuzzy_dedupe_pipeline_spark.minhash import with_signatures
from fuzzy_dedupe_pipeline_spark.verify import verify_pairs


class IncrementalDedupe:
    """Join-against-history incremental near-dup clustering."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: DedupeConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir.rstrip("/")
        self.sigs_path = f"{self.state_dir}/sigs"
        self.bands_path = f"{self.state_dir}/bands"
        self.labels_path = f"{self.state_dir}/labels"

    def _have_state(self) -> bool:
        return os.path.exists(f"{self.labels_path}/_SUCCESS")

    # -- one micro-batch -----------------------------------------------------

    def process_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        id_col: str = "url",
        text_col: str = "text",
    ) -> DataFrame:
        """Returns (id, cluster_id, batch_id) for the batch docs and commits
        state. Runs on the batch DataFrame's own session (foreachBatch-safe).
        """
        spark = batch_df.sparkSession
        cfg = self.cfg

        clean = clean_docs(batch_df, id_col, text_col)
        sigs_new = with_signatures(
            clean.select(F.col("id").alias("url"), "text_norm"),
            cfg,
            id_col="url",
            text_col="text_norm",
        ).localCheckpoint()
        nonempty = sigs_new.filter(F.size("shingles") > 0)
        bands_new = band_table(nonempty, cfg).localCheckpoint()

        intra, _dropped = candidate_pairs(nonempty, cfg)

        if self._have_state():
            sigs_old = spark.read.parquet(self.sigs_path)
            bands_old = spark.read.parquet(self.bands_path)
            labels_old = spark.read.parquet(self.labels_path)
            # store-side index is the big side; broadcast the micro-batch bands
            cross = (
                bands_old.join(
                    F.broadcast(
                        bands_new.select(
                            "band_id", "band_hash", F.col("id").alias("id_new")
                        )
                    ),
                    ["band_id", "band_hash"],
                )
                .select(
                    F.least(F.col("id"), F.col("id_new")).alias("id1"),
                    F.greatest(F.col("id"), F.col("id_new")).alias("id2"),
                )
                .dropDuplicates(["id1", "id2"])
            )
            candidates = intra.union(cross).dropDuplicates(["id1", "id2"])
            sigs_all = sigs_old.unionByName(sigs_new)
        else:
            sigs_old = None
            labels_old = None
            candidates = intra
            sigs_all = sigs_new

        edges = verify_pairs(
            candidates, candidates.limit(0), sigs_all, cfg
        ).select("id1", "id2")

        # rewrite old endpoints to their existing cluster label so min-label
        # CC over the batch subgraph composes with the global labelling
        if labels_old is not None:
            l1 = labels_old.select(
                F.col("id").alias("id1"), F.col("cluster_id").alias("c1")
            )
            l2 = labels_old.select(
                F.col("id").alias("id2"), F.col("cluster_id").alias("c2")
            )
            edges = (
                edges.join(l1, "id1", "left")
                .join(l2, "id2", "left")
                .select(
                    F.coalesce("c1", F.col("id1")).alias("id1"),
                    F.coalesce("c2", F.col("id2")).alias("id2"),
                )
            )

        comp = connected_components(edges, max_iters=cfg.cc_max_iters)
        assign = attach_singletons(sigs_new.select("id"), comp)

        if labels_old is not None:
            # a batch doc bridging two existing clusters merges them:
            # any old cluster label that CC relabelled propagates to the store
            remap = (
                comp.join(
                    labels_old.select(
                        F.col("cluster_id").alias("id")
                    ).distinct(),
                    "id",
                )
                .filter(F.col("cluster_id") != F.col("id"))
                .select(
                    F.col("id").alias("old_cluster"),
                    F.col("cluster_id").alias("new_cluster"),
                )
            )
            labels_updated = (
                labels_old.join(
                    remap,
                    labels_old.cluster_id == remap.old_cluster,
                    "left",
                )
                .select(
                    "id",
                    F.coalesce("new_cluster", "cluster_id").alias("cluster_id"),
                )
            )
            labels_full = labels_updated.unionByName(assign)
        else:
            labels_full = assign

        # commit state: sigs/bands append, labels overwrite (materialize
        # first — can't overwrite a path while a plan still reads it)
        labels_full = labels_full.localCheckpoint()
        sigs_new.write.mode("append").parquet(self.sigs_path)
        bands_new.write.mode("append").parquet(self.bands_path)
        labels_full.write.mode("overwrite").parquet(self.labels_path)

        return assign.select(
            "id", "cluster_id", F.lit(batch_id).cast("long").alias("batch_id")
        )

    # -- the stream ------------------------------------------------------------

    def run_stream(
        self,
        input_dir: str,
        schema,
        output_dir: str,
        checkpoint_dir: str,
        id_col: str = "url",
        text_col: str = "text",
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
    ):
        """readStream(parquet files) -> foreachBatch(process_batch) -> parquet
        append. available_now drains everything currently in input_dir and
        stops (the test/backfill mode); without it the query runs continuous
        micro-batches. Returns the StreamingQuery."""
        reader = self.spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(input_dir)

        def _fb(batch_df: DataFrame, batch_id: int) -> None:
            out = self.process_batch(batch_df, batch_id, id_col, text_col)
            out.write.mode("append").parquet(output_dir)

        writer = stream.writeStream.foreachBatch(_fb).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
