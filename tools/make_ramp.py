#!/usr/bin/env python3
"""Build the sf1x scale-ramp fixture: a 10x replica of sf0.1 with
key-offset copies, so the bench can measure per-query scaling slope
(VERDICT r4 #7). Foreign keys are offset consistently (orders.custkey
tracks customer.custkey etc.); tiny dims (region, nation) are kept
as-is. Text/embedding payloads repeat across replicas — deliberate: a
10x crawl is full of exact duplicates, and the dedup family is supposed
to face them (their candidate graphs densify superlinearly BY DESIGN;
the slope table calls this out rather than hiding it).

Output row groups are capped small so Spark's scan still splits (the
single-row-group fixture trap).

Usage: python3 tools/make_ramp.py [src_sf_dir] [out_dir] [replicas]
Dev-only tooling — not part of the shipped Scala library.
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1x"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: offset_key_table_column} ; offset unit = max(key)+1
OFFSETS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
KEY_TABLE = {"c_custkey": "customer", "s_suppkey": "supplier",
             "p_partkey": "part", "o_orderkey": "orders",
             "event_id": "events", "user_id": "events",
             "doc_id": "documents", "vec_id": "embeddings"}


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    units = {}
    for key, tbl in KEY_TABLE.items():
        units[key] = con.execute(
            f"SELECT max({key}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
    for tbl, offs in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'").fetchall()]
        reps = 1 if not offs else N
        selects = []
        for k in range(reps):
            proj = ", ".join(
                f"{c} + {k * units[offs[c]]} AS {c}" if c in offs else c
                for c in cols)
            selects.append(f"SELECT {proj} FROM '{SRC}/{tbl}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{tbl}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows x{reps}")


if __name__ == "__main__":
    main()
