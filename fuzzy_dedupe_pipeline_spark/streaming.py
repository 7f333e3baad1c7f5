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
  sigs/batch_id=N/   per-batch partition (id, n_tokens, shingles, minhash, simhash)
  bands/batch_id=N/  per-batch partition (id, band_id, band_hash) — the LSH index
  labels/bucket=B/   (id, cluster_id) hash-bucketed by id; only buckets touched
                     by a batch are rewritten (dynamic partition overwrite —
                     the MERGE INTO analog), so label-commit cost is
                     O(touched clusters), not O(all docs ever seen)
  commits/batch_N    high-watermark marker, written LAST

Exactly-once: the file-source checkpoint gives at-least-once foreachBatch
execution; this module makes replays IDEMPOTENT rather than assuming
exactly-once:
  * a replayed batch whose commit marker exists is a pure no-op on state —
    its output rows are re-emitted by reading the stored labels
  * sigs/bands writes go to a batch_id=N partition with overwrite, so a
    crash-then-replay rewrites the same partition instead of appending dupes
  * label buckets are rewritten from (stored labels + batch), a computation
    that converges under replay even if a crash left some buckets new and
    some old
Re-seen ids (a re-crawled URL in a later dump) are dropped before signing —
first-seen text wins (documented policy; emit-latest would need a tombstone
pass over sigs, an Iceberg MERGE at production scale). Within a batch,
duplicate ids are collapsed to one arbitrary-but-deterministic row first.

All state probes go through the Hadoop FileSystem API, not os.path — the
state dir may be HDFS/S3 in production, where driver-local os.path.exists
would silently report "no state" and the store would be clobbered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.cc import attach_singletons, connected_components
from fuzzy_dedupe_pipeline_spark.config import DEFAULT_CONFIG, DedupeConfig
from fuzzy_dedupe_pipeline_spark.dataflow import clean_docs
from fuzzy_dedupe_pipeline_spark.fs import (
    fs_delete,
    fs_exists,
    fs_list_names,
    fs_rename,
    fs_touch,
    hadoop_fs,
)
from fuzzy_dedupe_pipeline_spark.lsh import band_table, candidate_pairs
from fuzzy_dedupe_pipeline_spark.minhash import with_signatures
from fuzzy_dedupe_pipeline_spark.verify import verify_pairs

N_LABEL_BUCKETS = 64


class IncrementalDedupe:
    """Join-against-history incremental near-dup clustering."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: DedupeConfig = DEFAULT_CONFIG,
        n_label_buckets: int = N_LABEL_BUCKETS,
    ):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir.rstrip("/")
        self.sigs_path = f"{self.state_dir}/sigs"
        self.bands_path = f"{self.state_dir}/bands"
        self.labels_path = f"{self.state_dir}/labels"
        self.commits_path = f"{self.state_dir}/commits"
        self.n_label_buckets = n_label_buckets

    # -- Hadoop-FS state probes (shared helpers in fs.py; work on HDFS/S3) ----

    def _have_state(self, spark: SparkSession) -> bool:
        """Any batch fully committed? Our own commit markers are the signal —
        a dynamic-partition-overwrite write does NOT refresh a root _SUCCESS
        file, and a half-written labels dir (crash mid-write) must not count
        as state either."""
        return len(fs_list_names(spark, self.commits_path)) > 0

    def _committed(self, spark: SparkSession, batch_id: int) -> bool:
        return fs_exists(spark, f"{self.commits_path}/batch_{batch_id}")

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_label_buckets)).cast("int")

    # -- state compaction ----------------------------------------------------
    #
    # sigs/ and bands/ gain one batch_id=N partition dir per micro-batch; at
    # thousands of batches the state read cost is dominated by file listing.
    # compact_state() rewrites all partitions STRICTLY BELOW the newest
    # committed batch into the single sentinel partition batch_id=-1 (merging
    # any previous sentinel). The newest committed partition is kept as-is so
    # an at-least-once replay of the most recent batch (the only batch the
    # stream checkpoint can replay) still finds its own partition. Iceberg
    # mapping: rewrite_data_files + expire_snapshots.
    #
    # Crash safety (marker protocol, same spirit as the commit markers):
    #   1. write consolidated rows to {state}/.compact/<table>/ (+_SUCCESS)
    #   2. write marker {state}/.compact/COMMIT_<table> listing source dirs
    #   3. delete source partition dirs
    #   4. rename staging -> <table>/batch_id=-1
    #   5. delete marker
    # A crash before 2 leaves only staging garbage (sources intact). A crash
    # after 2 is finished by _recover_compaction() (called at the top of
    # process_batch): the marker proves staging holds the full merged set, so
    # re-running 3-5 is idempotent.

    def _compact_marker(self, table: str) -> str:
        return f"{self.state_dir}/.compact/COMMIT_{table}"

    def _list_batch_parts(self, spark: SparkSession, path: str) -> list[int]:
        return [
            int(name.split("=", 1)[1])
            for name in fs_list_names(spark, path)
            if name.startswith("batch_id=")
        ]

    def _compact_table(
        self, spark: SparkSession, path: str, table: str, merge_ids: list[int]
    ) -> None:
        staging = f"{self.state_dir}/.compact/{table}"
        parts = [f"{path}/batch_id={b}" for b in sorted(merge_ids)]
        # read_parquet on explicit dirs drops the partition column; that is
        # fine — the consolidated rows live under batch_id=-1 afterwards
        (
            spark.read.parquet(*parts)
            .coalesce(max(1, self.n_label_buckets // 8))
            .write.mode("overwrite")
            .parquet(staging)
        )
        # marker write must be ATOMIC: fs.create+write+close can crash midway
        # leaving a truncated source list, and _finish_compaction would then
        # delete only the listed sources and rename staging onto a still-
        # existing batch_id=-1 (Hadoop rename onto an existing dir NESTS src
        # inside dst). Write to a temp path and rename into place — file
        # rename is atomic on HDFS and posix.
        marker = self._compact_marker(table)
        tmp = marker + ".tmp"
        mfs, mpath = hadoop_fs(spark, tmp)
        out = mfs.create(mpath, True)
        out.write(bytearray("\n".join(map(str, sorted(merge_ids))).encode()))
        out.close()
        fs_rename(spark, tmp, marker)
        self._finish_compaction(spark, path, table)

    def _finish_compaction(self, spark: SparkSession, path: str, table: str) -> None:
        """Steps 3-5 of the protocol; idempotent, also the crash-recovery."""
        marker = self._compact_marker(table)
        if not fs_exists(spark, marker):
            return
        merged = (
            spark.read.format("text").load(marker).toPandas()["value"].tolist()
        )
        staging = f"{self.state_dir}/.compact/{table}"
        if fs_exists(spark, staging):
            for b in merged:
                p = f"{path}/batch_id={int(b)}"
                if fs_exists(spark, p):
                    fs_delete(spark, p, recursive=True)
            dest = f"{path}/batch_id=-1"
            if fs_exists(spark, dest):
                # the marker (written atomically) lists every merged source
                # including any previous sentinel, so a surviving dest means
                # state corruption — renaming would NEST staging inside it
                # and duplicate rows. Refuse loudly.
                raise RuntimeError(
                    f"compaction: {dest} exists but is not in the marker's "
                    f"source list ({merged}) — state is inconsistent; "
                    "refusing to rename staging over it"
                )
            fs_rename(spark, staging, dest)
        fs_delete(spark, marker)

    def _recover_compaction(self, spark: SparkSession) -> None:
        for table, path in (("sigs", self.sigs_path), ("bands", self.bands_path)):
            self._finish_compaction(spark, path, table)

    def compact_state(self, watermark: int | None = None) -> int:
        """Merge sigs/bands partitions with batch_id < watermark (default: the
        newest committed batch) into the batch_id=-1 sentinel. Returns the
        number of partition dirs merged per table (0 = nothing to do).
        Run between triggers (maintenance), not concurrent with a batch."""
        spark = self.spark
        self._recover_compaction(spark)
        committed = [
            int(name.split("_", 1)[1])
            for name in fs_list_names(spark, self.commits_path)
        ]
        if not committed:
            return 0
        # clamp to the newest committed batch: an explicit watermark above it
        # would fold that batch's partition into the sentinel, and a later
        # at-least-once replay of it takes the _committed path, which reads
        # sigs/batch_id=N directly — path-not-found would kill the stream
        watermark = (
            max(committed) if watermark is None else min(watermark, max(committed))
        )
        merged = 0
        for table, path in (("sigs", self.sigs_path), ("bands", self.bands_path)):
            ids = [
                b
                for b in self._list_batch_parts(spark, path)
                if b == -1 or b < watermark
            ]
            if len(ids) <= 1:
                continue
            self._compact_table(spark, path, table, ids)
            merged = max(merged, len(ids))
        return merged

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
        Idempotent under at-least-once replay (see module docstring).
        """
        spark = batch_df.sparkSession
        cfg = self.cfg
        # finish any compaction a crash interrupted (no-op in the common case:
        # two existence probes)
        self._recover_compaction(spark)

        # intra-batch id collapse must be DETERMINISTIC (dropDuplicates keeps
        # an arbitrary row, which would break replay idempotence): min text
        # wins
        from pyspark.sql import Window

        w_id = Window.partitionBy("id").orderBy("text_norm", "text_final")
        clean = (
            clean_docs(batch_df, id_col, text_col)
            .withColumn("_rn", F.row_number().over(w_id))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        if self._committed(spark, batch_id):
            # replayed batch: state already reflects it — re-emit output from
            # the stored labels, touch nothing. The original execution only
            # emitted ids it actually signed (re-seen ids were dropped by the
            # first-seen-wins anti-join), so restrict to this batch's own sigs
            # partition — joining ALL clean ids against labels would re-emit
            # rows the original run never produced (extra rows in an
            # at-least-once downstream sink).
            batch_ids = spark.read.parquet(
                f"{self.sigs_path}/batch_id={batch_id}"
            ).select("id")
            labels = spark.read.parquet(self.labels_path)
            return (
                clean.select("id")
                .join(batch_ids, "id", "left_semi")
                .join(labels.select("id", "cluster_id"), "id", "left")
                .select(
                    "id",
                    F.coalesce("cluster_id", "id").alias("cluster_id"),
                    F.lit(batch_id).cast("long").alias("batch_id"),
                )
            )

        persists: list[DataFrame] = []
        have_state = self._have_state(spark)
        if have_state:
            labels_old = spark.read.parquet(self.labels_path).select(
                "id", "cluster_id"
            )
            # exclude THIS batch's partition: a crash after the sigs write
            # but before the commit marker must not make the replay see its
            # own half-committed rows as "already seen" (partition-pruned
            # filter — only older batch dirs are scanned)
            prior_sigs = spark.read.parquet(self.sigs_path).filter(
                F.col("batch_id") != batch_id
            )
            seen_ids = prior_sigs.select("id")
            # first-seen wins: a re-crawled url must not re-enter the index
            # (duplicate sig rows would self-pair in the bands join and emit
            # conflicting label rows)
            fresh = clean.join(seen_ids, "id", "left_anti")
        else:
            labels_old = None
            fresh = clean

        sigs_new = with_signatures(
            fresh.select(F.col("id").alias("url"), "text_norm"),
            cfg,
            id_col="url",
            text_col="text_norm",
        ).localCheckpoint()
        nonempty = sigs_new.filter(F.size("shingles") > 0)
        bands_new = band_table(nonempty, cfg).localCheckpoint()

        intra, _dropped = candidate_pairs(nonempty, cfg, persists=persists)

        if have_state:
            bands_old = spark.read.parquet(self.bands_path).filter(
                F.col("batch_id") != batch_id
            )
            sigs_old = prior_sigs
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
            sigs_all = sigs_old.drop("batch_id").unionByName(sigs_new)
        else:
            candidates = intra
            sigs_all = sigs_new

        edges = verify_pairs(
            candidates, candidates.limit(0), sigs_all, cfg, persists=persists
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

        comp = connected_components(
            edges, max_iters=cfg.cc_max_iters, checkpoint_dir=cfg.checkpoint_dir
        )
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
            old_b = labels_old.withColumn("bucket", self._bucket(F.col("id")))
            updated = (
                old_b.join(
                    remap, old_b.cluster_id == remap.old_cluster, "left"
                )
                .select(
                    "id",
                    F.coalesce("new_cluster", "cluster_id").alias("cluster_id"),
                    "bucket",
                    F.col("new_cluster").isNotNull().alias("changed"),
                )
            )
            new_b = assign.withColumn("bucket", self._bucket(F.col("id")))
            # MERGE-INTO analog: rewrite ONLY buckets containing a changed or
            # new row. Rows to write = full contents of touched buckets (a
            # dynamic partition overwrite replaces whole partitions).
            touched = (
                updated.filter("changed")
                .select("bucket")
                .union(new_b.select("bucket"))
                .distinct()
            )
            to_write = (
                updated.join(touched, "bucket", "left_semi")
                .select("id", "cluster_id", "bucket")
                .unionByName(new_b.select("id", "cluster_id", "bucket"))
                .localCheckpoint()
            )
        else:
            to_write = (
                assign.withColumn("bucket", self._bucket(F.col("id")))
                .localCheckpoint()
            )

        # commit order: index partitions first (idempotent per-batch
        # overwrite), labels buckets next, watermark marker LAST
        sigs_new.write.mode("overwrite").parquet(
            f"{self.sigs_path}/batch_id={batch_id}"
        )
        bands_new.write.mode("overwrite").parquet(
            f"{self.bands_path}/batch_id={batch_id}"
        )
        with_dyn = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            to_write.write.mode("overwrite").partitionBy("bucket").parquet(
                self.labels_path
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", with_dyn
            )
        fs_touch(spark, f"{self.commits_path}/batch_{batch_id}")
        for df in persists:
            df.unpersist()

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
