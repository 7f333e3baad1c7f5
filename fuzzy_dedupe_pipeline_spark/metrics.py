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
        """One lineage row per physical partition of a materialized output."""
        t0 = _now()
        counts = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .collect()
        )
        self._append(
            [
                (
                    self.run_id,
                    stage,
                    int(r["partition_id"]),
                    "partition",
                    t0,
                    _now(),
                    None,
                    int(r["rows_out"]),
                    None,
                    None,
                )
                for r in counts
            ]
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def compact(self) -> None:
        """Rewrite the metrics table as one file. Each append above writes
        one small file for incremental durability (resume must see rows from
        crashed runs); over many stages/runs that accumulates a tiny-file
        swarm — call this at end of run. (Iceberg's rewrite_data_files
        compaction is the production analog.)"""
        snapshot = self.read().localCheckpoint()  # detach from source files
        snapshot.coalesce(1).write.mode("overwrite").parquet(self.path)


class StageTimer:
    def __init__(self) -> None:
        self.start = _now()
        self._t0 = time.monotonic()

    @property
    def ms(self) -> int:
        return int((time.monotonic() - self._t0) * 1000)
