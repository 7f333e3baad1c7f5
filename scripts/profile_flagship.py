"""Profile the flagship dedup job: per-job wall time from the Spark event log.

Usage:  python scripts/profile_flagship.py <cores> [n_docs]

Runs the flagship once (after warmup) at local[<cores>] with event logging,
then prints one line per job: job id, duration, num tasks, and the callsite —
so we can see exactly which jobs fail to scale when cores go 8 -> 32.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from fuzzy_dedupe_pipeline_spark.session import get_spark


def main() -> None:
    # arg 1: "32" (local[32]) or "4x8" (local-cluster[4 execs, 8 cores each])
    level = sys.argv[1] if len(sys.argv) > 1 else "32"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 120000
    bench._ensure_corpus(n_docs)
    log_dir = f"/tmp/spark-events-{level}-{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if "x" in level:
        execs, per = (int(v) for v in level.split("x"))
        spark = get_spark(
            cores=per,
            executors=execs,
            shuffle_partitions=max(8, execs * per),
            extra_conf=conf,
        )
    else:
        cores = int(level)
        spark = get_spark(
            cores=cores, shuffle_partitions=max(8, cores), extra_conf=conf
        )
    wall = bench.run_flagship(spark, warmup=True, n_docs=n_docs)
    print(f"WALL {wall:.2f}s at level {level} / {n_docs} docs", flush=True)
    spark.stop()
    time.sleep(2)
    import faulthandler, traceback  # noqa: E401

    def _hook(t, v, tb):
        traceback.print_exception(t, v, tb, file=sys.stdout)

    sys.excepthook = _hook

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    tasks: dict[int, list] = {}
    paths = [p for p in glob.glob(f"{log_dir}/**", recursive=True) if os.path.isfile(p)]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "site": ev.get("Properties", {}).get(
                            "callSite.short", ""
                        ),
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                        "ntasks": sum(
                            s["Number of Tasks"] for s in ev["Stage Infos"]
                        ),
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    if "Completion Time" in si and "Submission Time" in si:
                        stages[si["Stage ID"]] = {
                            "dur": (si["Completion Time"] - si["Submission Time"])
                            / 1000.0,
                            "name": si["Stage Name"],
                            "ntasks": si["Number of Tasks"],
                        }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    if "Finish Time" in ti and "Launch Time" in ti:
                        tasks.setdefault(sid, []).append(
                            (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                        )

    total = 0.0
    rows = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        total += dur
        rows.append((jid, dur, j["ntasks"], j["site"]))
    print(f"jobs total {total:.2f}s across {len(rows)} jobs")
    for jid, dur, ntasks, site in rows:
        if dur >= 0.2:
            print(f"  job {jid:4d}  {dur:7.2f}s  {ntasks:5d} tasks  {site}")
    print("top stages (dur, tasks, max/median task — skew signal):")
    import statistics

    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["dur"])[:25]:
        ts = sorted(tasks.get(sid, []))
        mx = ts[-1] if ts else 0.0
        md = statistics.median(ts) if ts else 0.0
        print(
            f"  stage {sid:4d}  {s['dur']:7.2f}s  {s['ntasks']:5d} tasks  "
            f"max {mx:7.2f}s med {md:6.2f}s  {s['name'][:70]}"
        )


if __name__ == "__main__":
    main()
