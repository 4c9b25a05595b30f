#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (dev tool only;
the engine itself is pure Scala/Spark).

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view, runs every oracle query, and compares against the Spark
result parquet written by `graft.Verify` (columns sorted by name, rows
sorted by all columns, exact match for non-floats, tiny-epsilon for
floats)."""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, str) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                import numpy as np
                eq = np.isclose(g.astype(float), w.astype(float),
                                rtol=1e-9, atol=1e-9, equal_nan=True).all()
            else:
                eq = g.equals(w) or (g.astype(str) == w.astype(str)).all()
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                diff = got[c] != want[c]
                print(f"  {c}: got {got[c][diff].head(3).tolist()} want "
                      f"{want[c][diff].head(3).tolist()}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
