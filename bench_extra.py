"""Extra benchmark harness for optimization work (bench.py is FROZEN for
driver measurement; this file holds the builder's own instrumentation).

Per-query noop-sink timing (guide §1.4) at any SF dir, optional
`.explain("formatted")` capture per query (guide §7.2), min-of-N reporting.

Usage:
  python bench_extra.py                          # all bench queries, sf from env
  python bench_extra.py --queries a,b,c          # subset
  python bench_extra.py --reps 3
  python bench_extra.py --plans plans/r06 --suffix _before   # capture plans
  python bench_extra.py --flagship               # include flagship dedup
Env:
  SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the driver's
  round-5 measurement scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from fuzzy_dedupe_pipeline_spark.session import get_spark

    import bench
    import __spark_entry__ as entrymod

    spark = get_spark(cores=CPUS, shuffle_partitions=max(8, CPUS))
    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else list(bench.BENCH_QUERIES)

    timings: dict[str, list[float]] = {}
    if args.flagship:
        bench._ensure_corpus()
        runs = []
        for rep in range(args.reps):
            runs.append(round(bench.run_flagship(spark, warmup=(rep == 0)), 3))
            spark.catalog.clearCache()
        timings["flagship_dedupe_synth"] = runs

    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        runs = []
        for _rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            tq = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - tq, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        timings[name] = runs
        print(f"{name:28s} min={min(runs):8.3f}  runs={runs}", flush=True)

    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "min": {k: min(v) for k, v in timings.items()},
        "runs": timings,
        "total_min": round(sum(min(v) for v in timings.values()), 3),
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
