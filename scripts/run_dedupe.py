#!/usr/bin/env python3
"""spark-submit entry point for the dedup pipeline (north rule: `spark-submit
--py-files` on a multi-executor cluster).

Cluster:
  zip -r fdps.zip fuzzy_dedupe_pipeline_spark
  spark-submit --py-files fdps.zip scripts/run_dedupe.py \\
      --input  <pages table path/glob> \\
      --out    <output dir (stages + clusters + metrics)> \\
      --run-id crawl-2026-08 [--no-resume] [--id-col url --text-col text]

Local smoke:
  python scripts/run_dedupe.py --input /tmp/pages.parquet --out /tmp/dedupe_out

The session is created with getOrCreate, so every cluster knob
(master, executors, memory, shuffle partitions) comes from spark-submit
--conf flags; local runs fall back to the tuned local-mode defaults in
session.get_spark.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages table (parquet path)")
    p.add_argument("--out", required=True, help="output/checkpoint directory")
    p.add_argument("--run-id", default=None)
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument(
        "--no-resume",
        action="store_true",
        help="recompute every stage even if its checkpoint exists",
    )
    p.add_argument(
        "--no-lineage",
        action="store_true",
        help="skip per-partition lineage rows (stage metrics still written)",
    )
    args = p.parse_args(argv)

    from fuzzy_dedupe_pipeline_spark.pipeline import DedupePipeline
    from fuzzy_dedupe_pipeline_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(app_name="fuzzy-dedupe-pipeline")
    pages = spark.read.parquet(args.input)
    if args.id_col != "url":
        pages = pages.withColumnRenamed(args.id_col, "url")
    if args.text_col != "text":
        pages = pages.withColumnRenamed(args.text_col, "text")
    # fill optional north-rule columns so any (id, text) table runs
    for col, typ in (
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("lang", "string"),
    ):
        if col not in pages.columns:
            pages = pages.withColumn(col, F.lit(None).cast(typ))

    pipe = DedupePipeline(
        spark,
        args.out,
        run_id=args.run_id,
        resume=not args.no_resume,
        lineage=not args.no_lineage,
    )
    clusters = pipe.run(pages)
    n = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(
        f"run_id={pipe.run_id} docs={n} clusters={n_clusters} "
        f"recomputed_stages={pipe.recomputed or 'none (resumed)'} "
        f"out={args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
