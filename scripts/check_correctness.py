"""Local replica of the driver's correctness gate: run every __spark_entry__
query AND its DuckDB oracle at sf0.01, compare rows / schema-width / order-
insensitive value hash. Usage: python scripts/check_correctness.py [q1 q2 ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell rendering, order-insensitive: sort the rendered rows
    def render(v):
        if pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, bool):
            return str(bool(v)).lower()
        return str(v)

    rows = sorted(
        "|".join(render(v) for v in rec) for rec in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    only = set(sys.argv[1:])
    import __spark_entry__ as em
    from fuzzy_dedupe_pipeline_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = em.queries(), em.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name:26s} rows={len(got):6d}  (no oracle)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        # normalize bool-ish columns
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        hg, hw = value_hash(got), value_hash(want)
        ok = ok_rows and ok_cols and hg == hw
        print(
            f"{name:26s} rows={len(got):6d}/{len(want):6d} cols={'ok ' if ok_cols else 'XX '}"
            f"hash={'ok' if hg == hw else f'XX {hg} {hw}'}"
        )
        if not ok:
            fails.append(name)
            if not ok_cols:
                print("   spark cols:", sorted(got.columns))
                print("   oracle cols:", sorted(want.columns))
    print("FAILED:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
