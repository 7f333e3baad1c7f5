"""Local stand-in for the driver's correctness gate: runs every
__spark_entry__ query on Spark and its oracle_sql on DuckDB at sf0.01 and
compares row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from fuzzy_dedupe_pipeline_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_df = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(spark_df)} rows  (no oracle)")
            continue
        duck_df = con.execute(oracles[name]).df()
        s, d = canon(spark_df), canon(duck_df)
        ok_rows = len(s) == len(d)
        ok_cols = list(s.columns) == list(d.columns)
        ok_vals = ok_rows and ok_cols and s.equals(d)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:24s} {status}  spark={len(s)} duck={len(d)} "
            f"cols={'=' if ok_cols else f'{list(s.columns)} vs {list(d.columns)}'}"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                neq = ~(s == d).all(axis=1)
                print("  first diffs (spark vs duck):")
                print(pd.concat([s[neq].head(3), d[neq].head(3)], axis=1).to_string())
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all parity checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
