"""North-rule evidence: the pipeline runs via `spark-submit --py-files` on a
multi-executor master (local-cluster[2,2,1024] — two separate executor JVMs
with their own Python worker pools, the sandbox's closest analog to a real
cluster).

The test is built so the package can ONLY come from the --py-files zip:
spark-submit runs from a temp cwd containing a COPY of scripts/run_dedupe.py
(whose repo-root sys.path fallback then points at a dir with no package), so
a missing/broken zip fails the import on the driver, and executor-side Arrow
UDFs fail unless the zip reaches the executors' Python workers.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_multi_executor(tmp_path):
    # corpus: small but with planted duplicate families (truth known)
    from fuzzy_dedupe_pipeline_spark import oracle
    from fuzzy_dedupe_pipeline_spark.synth import generate_pages

    corpus = generate_pages(n_docs=120, seed=7)
    inp = str(tmp_path / "pages.parquet")
    corpus.pages.to_parquet(inp, index=False, row_group_size=16)

    # package zip — the ONLY source of fuzzy_dedupe_pipeline_spark below
    zpath = str(tmp_path / "fdps.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "fuzzy_dedupe_pipeline_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "scripts", "run_dedupe.py"), tmp_path)

    out = str(tmp_path / "dedupe_out")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,2,1024]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(tmp_path / "run_dedupe.py"),
            "--input", inp,
            "--out", out,
            "--run-id", "submit-smoke",
        ],
        cwd=str(tmp_path),  # NOT the repo: no working-tree import fallback
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # read clusters back and check recall vs planted truth — same gate as
    # the in-process pipeline tests, now across two executor JVMs
    import duckdb

    m = duckdb.connect().execute(
        f"SELECT url, cluster_id FROM read_parquet('{out}/07_clusters/*.parquet')"
    ).fetchdf()
    assert len(m) == 120
    co = m.merge(m, on="cluster_id")
    co = co[co.url_x < co.url_y].rename(columns={"url_x": "url1", "url_y": "url2"})
    tp = oracle.true_pairs(corpus.pages, corpus.truth)
    assert oracle.pair_recall(co, tp) >= 0.99
