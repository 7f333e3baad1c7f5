"""The flagship dedup pipeline: stage runner with checkpoint-resume.

Dataflow (Spark rebuild of run_deduplication, dedupe_logic/processor.py:263-470):

  pages ──ingest──> pages_clean (html->text Arrow UDF + normalize_text)
        ──exact───> exact-dup groups collapsed FIRST (sha256(text_norm) groupBy;
                    star edges rep->member). This is the big scale win the
                    reference lacks: identical docs (~20% of web crawls) never
                    reach LSH, where an m-clone group would otherwise collide in
                    every band and emit O(m^2 * bands) join rows.
        ──sigs────> MinHash+SimHash on exact-representatives only (Arrow UDF)
        ──lsh─────> band equi-join candidates (skew-capped, drops logged)
        ──substr──> winnowed-fingerprint candidates (skew-capped)
        ──verify──> exact Jaccard + SimHash + containment cascade -> edges
        ──cc──────> min-label-propagation components (exact ∪ verified edges)
        ──canon───> representative window + cluster stats -> clusters table

Every stage materializes to parquet under out_dir (Iceberg-table analog),
appends a metrics row + per-partition lineage rows, and is SKIPPED on rerun
when its output already exists (checkpoint-resume; north rule). Stage outputs
are re-read from disk, so a resumed run is plan-identical to a fresh one.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.canonical import cluster_output
from fuzzy_dedupe_pipeline_spark.cc import attach_singletons, connected_components
from fuzzy_dedupe_pipeline_spark.config import DEFAULT_CONFIG, DedupeConfig
from fuzzy_dedupe_pipeline_spark.fs import fs_exists
from fuzzy_dedupe_pipeline_spark.lsh import candidate_pairs
from fuzzy_dedupe_pipeline_spark.metrics import MetricsLog, StageTimer
from fuzzy_dedupe_pipeline_spark.minhash import with_signatures
from fuzzy_dedupe_pipeline_spark.normalize import ingest_pages, tokens_raw_col
from fuzzy_dedupe_pipeline_spark.substring import substring_candidates
from fuzzy_dedupe_pipeline_spark.urltools import url_tier_dedup
from fuzzy_dedupe_pipeline_spark.verify import verify_pairs

STAGES = [
    "00_url_dedup",  # optional tier 0 (url_tier=True)
    "00_pages_clean",
    "01_exact_edges",
    "02_sigs",
    "03_lsh_pairs",
    "04_sub_pairs",
    "05_edges",
    "06_members",
    "07_clusters",
]


class DedupePipeline:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        cfg: DedupeConfig = DEFAULT_CONFIG,
        run_id: str | None = None,
        resume: bool = True,
        lineage: bool = True,
        url_tier: bool = False,
    ):
        self.spark = spark
        self.out_dir = out_dir.rstrip("/")
        self.cfg = cfg
        self.resume = resume
        self.lineage = lineage
        self.url_tier = url_tier
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.metrics = MetricsLog(spark, self.out_dir, self.run_id)
        self.recomputed: list[str] = []
        self._persists: list[DataFrame] = []  # released after each stage write

    # -- stage plumbing ------------------------------------------------------

    def _path(self, stage: str) -> str:
        return f"{self.out_dir}/{stage}"

    def _done(self, stage: str) -> bool:
        # Hadoop-FS probe, not os.path: out_dir may be HDFS/S3, where a
        # driver-local check would answer "missing" and resume would never
        # trigger (every stage silently recomputed on every rerun)
        return fs_exists(self.spark, f"{self._path(stage)}/_SUCCESS")

    def _run_stage(self, stage: str, build) -> DataFrame:
        """Compute-or-load with metrics. `build` returns the stage DataFrame."""
        path = self._path(stage)
        if self.resume and self._done(stage):
            return self.spark.read.parquet(path)
        timer = StageTimer()
        try:
            df = build()
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            n = out.count()
            self.metrics.log_stage(stage, "success", timer.start, rows_out=n)
            if self.lineage:
                self.metrics.log_partitions(stage, out)
            self.recomputed.append(stage)
            return out
        except Exception as e:  # noqa: BLE001 — metrics row then re-raise
            self.metrics.log_stage(stage, "failed", timer.start, error=str(e)[:2000])
            raise
        finally:
            # stage output is on disk — release every frame the stage cached
            for cached in self._persists:
                cached.unpersist()
            self._persists.clear()

    # -- stages ---------------------------------------------------------------

    def run(self, pages: DataFrame) -> DataFrame:
        cfg = self.cfg

        # round-robin rebalance at ingest: source layout is untrusted (one
        # unsplittable row group = every row in one partition = all Arrow-UDF
        # stages serialized onto one core); the stage write then produces
        # defaultParallelism splittable files for every downstream stage
        par = self.spark.sparkContext.defaultParallelism

        if self.url_tier:
            # tier 0: collapse recrawls of the same canonical URL to the
            # latest crawl BEFORE any text is extracted or tokenized — the
            # cheapest tier (one groupBy on a short key, html untouched) and
            # the one that shrinks every stage below it. Recrawls are the
            # same resource, not duplicates to cluster, so they are dropped
            # here rather than edged.
            in_cols = list(pages.columns)
            pages = self._run_stage(
                "00_url_dedup", lambda: url_tier_dedup(pages).select(*in_cols)
            )

        meta_cols = [c for c in ("warc_ts", "lang") if c in pages.columns]
        pages_clean = self._run_stage(
            "00_pages_clean",
            lambda: ingest_pages(pages)
            .select("url", *meta_cols, "text_final", "text_norm")
            .repartition(par),
        )

        # exact dedup first: group identical normalized text
        def build_exact() -> DataFrame:
            keyed = pages_clean.select(
                "url", F.sha2(F.col("text_norm"), 256).alias("tkey")
            )
            reps = keyed.groupBy("tkey").agg(F.min("url").alias("rep"))
            return (
                keyed.join(reps, "tkey")
                .filter(F.col("url") != F.col("rep"))
                .select(
                    F.col("rep").alias("id1"),
                    F.col("url").alias("id2"),
                    F.lit(1.0).alias("jaccard"),
                    F.lit(1.0).alias("simhash_sim"),
                    F.lit(1.0).alias("containment"),
                    F.lit(True).alias("substring_match"),
                    F.lit("exact").alias("match_type"),
                    F.lit(1.0).alias("confidence"),
                )
            )

        exact_edges = self._run_stage("01_exact_edges", build_exact)

        def build_sigs() -> DataFrame:
            reps_only = pages_clean.join(
                exact_edges.select(F.col("id2").alias("url")), "url", "left_anti"
            )
            return with_signatures(reps_only, cfg, id_col="url", text_col="text_norm")

        sigs = self._run_stage("02_sigs", build_sigs)

        lsh_pairs = self._run_stage(
            "03_lsh_pairs",
            lambda: self._log_dropped(
                "03_lsh_pairs",
                *candidate_pairs(sigs, cfg, persists=self._persists),
            ),
        )

        def build_sub() -> DataFrame:
            reps_tok = pages_clean.join(
                exact_edges.select(F.col("id2").alias("url")), "url", "left_anti"
            ).select(
                F.col("url").alias("id"),
                tokens_raw_col(F.col("text_norm")).alias("tokens"),
            )
            pairs, dropped = substring_candidates(
                reps_tok, cfg, persists=self._persists
            )
            return self._log_dropped("04_sub_pairs", pairs, dropped)

        sub_pairs = self._run_stage("04_sub_pairs", build_sub)

        edges = self._run_stage(
            "05_edges",
            lambda: verify_pairs(
                lsh_pairs, sub_pairs, sigs, cfg, persists=self._persists
            ),
        )

        def build_members() -> DataFrame:
            # CC over near edges only; exact members inherit their rep's
            # label (rep == min id of its exact group, so min-over-reps is
            # the component min — see dataflow.dedupe_clusters)
            labels = connected_components(
                edges.select("id1", "id2"),
                max_iters=cfg.cc_max_iters,
                checkpoint_dir=cfg.checkpoint_dir,
            )
            exact_members = exact_edges.select(
                F.col("id2").alias("id"), F.col("id1").alias("rep")
            )
            rep_ids = pages_clean.select(F.col("url").alias("id")).join(
                exact_members.select("id"), "id", "left_anti"
            )
            rep_labels = attach_singletons(rep_ids, labels)
            member_labels = exact_members.join(
                rep_labels.select(F.col("id").alias("rep"), "cluster_id"),
                "rep",
            ).select("id", "cluster_id")
            return rep_labels.union(member_labels)

        members = self._run_stage("06_members", build_members)

        def build_clusters() -> DataFrame:
            all_edges = edges.select("id1", "id2", "confidence").union(
                exact_edges.select("id1", "id2", "confidence")
            )
            return cluster_output(
                members,
                all_edges,
                pages_clean.select(F.col("url").alias("id"), "text_final"),
            )

        clusters = self._run_stage("07_clusters", build_clusters)
        if self.recomputed:  # skip on a pure-resume no-op run
            self.metrics.compact()
        return clusters

    def _log_dropped(self, stage: str, pairs: DataFrame, dropped: DataFrame) -> DataFrame:
        """Persist skew-cap drops to the lineage table (never silent)."""
        n = dropped.count()
        if n > 0:
            timer = StageTimer()
            self.metrics.log_stage(
                f"{stage}/dropped_hot_buckets",
                "skew_capped",
                timer.start,
                rows_out=n,
            )
        return pairs

    # -- convenience -----------------------------------------------------------

    def edges(self) -> DataFrame:
        """All duplicate-pair edges (exact + verified) of a completed run."""
        e = self.spark.read.parquet(self._path("05_edges"))
        x = self.spark.read.parquet(self._path("01_exact_edges"))
        return e.unionByName(x, allowMissingColumns=True)

    def members(self) -> DataFrame:
        return self.spark.read.parquet(self._path("06_members"))


def run_dedupe(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: DedupeConfig = DEFAULT_CONFIG,
    **kw,
) -> DataFrame:
    return DedupePipeline(spark, out_dir, cfg, **kw).run(pages)
