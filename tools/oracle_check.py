#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py [verify_out_dir] [sf_dir]

Reads each <out>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from oracle_sql.json in DuckDB with views over the sf tables,
then compares: schema (column names), row count, and values with columns
sorted by name (mirroring the driver's hash compare).

Dev-only tooling — not part of the shipped Scala library.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    # DTYPE-STRICT: no dtype normalization — the driver's comparator hashes
    # values per-dtype, so int64 vs float64 (DuckDB HUGEINT sums) must FAIL
    # here too. Only object cells holding arrays are tuple-ized so pandas
    # can compare them element-wise.
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else v)
    return df


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gverify"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out}/*")
                   if not d.endswith(".json"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
        if name not in oracles:
            print(f"---- {name}: no oracle (rows-only), rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        gd, ed = [str(t) for t in got.dtypes], [str(t) for t in exp.dtypes]
        if gd != ed:
            diff = [(c, a, b) for c, a, b in zip(got.columns, gd, ed) if a != b]
            print(f"FAIL {name}: dtype mismatch {diff}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                          check_exact=True)
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
