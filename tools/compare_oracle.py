"""Driver-like harness: run each queries() entry and its oracle_sql() twin,
compare row count, column names, and order-insensitive value content.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        if df[c].dtype == bool:
            df[c] = df[c].astype(int)
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs = e.queries()
    sqls = e.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            ray_df = res.to_pandas()
        else:
            ray_df = pd.DataFrame(res)
        sql_df = con.sql(sqls[name]).df()
        a, b = normalize(ray_df), normalize(sql_df)
        ok_shape = a.shape == b.shape and list(a.columns) == list(b.columns)
        ok_vals = ok_shape and a.equals(b)
        status = "OK" if ok_vals else "MISMATCH"
        print(f"{name}: ray={ray_df.shape} sql={sql_df.shape} cols_match={list(a.columns)==list(b.columns)} -> {status}")
        if not ok_vals:
            failures += 1
            if ok_shape:
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
                bad_cols = [c for c in a.columns if neq[c].any()]
                print("  diff cols:", bad_cols)
                idx = neq.any(axis=1)
                print("  ray:", a[idx].head(5).to_string())
                print("  sql:", b[idx].head(5).to_string())
            else:
                print("  ray cols:", sorted(ray_df.columns))
                print("  sql cols:", sorted(sql_df.columns))
                ka = set(map(tuple, a.head(100000).itertuples(index=False)))
                kb = set(map(tuple, b.head(100000).itertuples(index=False)))
                print("  ray-only sample:", list(ka - kb)[:3])
                print("  sql-only sample:", list(kb - ka)[:3])
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
