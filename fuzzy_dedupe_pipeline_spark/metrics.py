"""Per-stage + per-partition metrics/lineage table.

Superset of the reference's `dedupe_log` rows (main.py:119-142: stage_name,
status, start_time, end_time, records_processed, duration_ms, error_message),
extended with per-partition lineage rows (north rule): for every materialized
stage output we append one row per file-partition with its row count, so a
resume/debug pass can see exactly which partition produced what.

Stored as an append-only parquet table at <out_dir>/metrics (the Iceberg
`metrics` table analog; parquet here because the sandbox has no Iceberg jars —
the writer is isolated in this module so swapping in `writeTo(...).append()`
is a one-liner).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),  # -1 = stage-level
        T.StructField("status", T.StringType(), False),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)


def _now() -> datetime:
    return datetime.now(timezone.utc)


class MetricsLog:
    def __init__(self, spark: SparkSession, out_dir: str, run_id: str):
        self.spark = spark
        self.path = f"{out_dir}/metrics"
        self.run_id = run_id

    def _append(self, rows: list[tuple]) -> None:
        # a parquet append would silently (re)create a table dir a crashed
        # compact() left renamed away — finish that swap first
        self._recover()
        df = self.spark.createDataFrame(rows, METRICS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def log_stage(
        self,
        stage: str,
        status: str,
        start: datetime,
        rows_in: int | None = None,
        rows_out: int | None = None,
        error: str | None = None,
    ) -> None:
        end = _now()
        self._append(
            [
                (
                    self.run_id,
                    stage,
                    -1,
                    status,
                    start,
                    end,
                    rows_in,
                    rows_out,
                    int((end - start).total_seconds() * 1000),
                    error,
                )
            ]
        )

    def log_partitions(self, stage: str, df: DataFrame) -> None:
        """One lineage row per physical partition of a materialized output.

        Fully engine-side: the per-partition counts are shaped into metrics
        rows and appended as a DataFrame write — no driver collect(). At
        thousands of stages x partitions a per-stage collect would serialize
        the lineage bookkeeping through the driver."""
        self._recover()
        t0 = _now()
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("partition_id").cast("int"),
                F.lit("partition").alias("status"),
                F.lit(t0).cast("timestamp").alias("start_time"),
                F.lit(t0).cast("timestamp").alias("end_time"),
                F.lit(None).cast("long").alias("rows_in"),
                F.col("rows_out").cast("long"),
                F.lit(None).cast("long").alias("duration_ms"),
                F.lit(None).cast("string").alias("error_message"),
            )
        )
        rows.coalesce(1).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        self._recover()
        return self.spark.read.parquet(self.path)

    def compact(self) -> None:
        """Rewrite the metrics table as one file. Each append above writes
        one small file for incremental durability (resume must see rows from
        crashed runs); over many stages/runs that accumulates a tiny-file
        swarm — call this at end of run. (Iceberg's rewrite_data_files
        compaction is the production analog.)

        Atomic swap, never overwrite-in-place: a crash between an in-place
        delete and rewrite would lose the whole lineage table (including the
        skew-drop rows the pipeline promises are never silent). Protocol:
        write snapshot to <path>__compact_tmp, rename path -> __old, rename
        tmp -> path, drop __old; _recover() (called from read()) finishes any
        crash-interrupted swap from whichever rename landed."""
        from fuzzy_dedupe_pipeline_spark.fs import fs_delete, fs_exists, fs_rename

        self._recover()
        tmp, old = f"{self.path}__compact_tmp", f"{self.path}__compact_old"
        # drop stale dirs from a crash just before a previous swap finished —
        # Hadoop rename onto an existing dir nests src INSIDE it
        for stale in (tmp, old):
            if fs_exists(self.spark, stale):
                fs_delete(self.spark, stale, recursive=True)
        snapshot = self.spark.read.parquet(self.path).localCheckpoint()
        snapshot.coalesce(1).write.mode("overwrite").parquet(tmp)
        fs_rename(self.spark, self.path, old)
        fs_rename(self.spark, tmp, self.path)
        fs_delete(self.spark, old, recursive=True)

    def _recover(self) -> None:
        """Finish a compact() a crash interrupted. Cheap: runs only when the
        table dir itself is missing."""
        from fuzzy_dedupe_pipeline_spark.fs import fs_delete, fs_exists, fs_rename

        if fs_exists(self.spark, self.path):
            return
        tmp, old = f"{self.path}__compact_tmp", f"{self.path}__compact_old"
        if fs_exists(self.spark, f"{tmp}/_SUCCESS"):
            # snapshot completed; the path->old rename landed but tmp->path
            # did not: finish forward
            fs_rename(self.spark, tmp, self.path)
            fs_delete(self.spark, old, recursive=True)
        elif fs_exists(self.spark, old):
            # snapshot incomplete: roll back
            fs_rename(self.spark, old, self.path)
            fs_delete(self.spark, tmp, recursive=True)


class StageTimer:
    def __init__(self) -> None:
        self.start = _now()
        self._t0 = time.monotonic()

    @property
    def ms(self) -> int:
        return int((time.monotonic() - self._t0) * 1000)
