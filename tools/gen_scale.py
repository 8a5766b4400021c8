#!/usr/bin/env python
"""Scale up the driver's deterministic sf0.1 test data by key-remapped
replication, for throughput-dominated benchmarking (VERDICT r02 item 1:
"demonstrate the ≤2× bar at a throughput-dominated scale (e.g. a
self-generated sf1) and commit the measurement").

Method (fully deterministic, no RNG): K disjoint copies of every scaling
table, copy i offsetting each key column by i × (max_key + 1). Foreign keys
are remapped with the SAME offsets, so every copy preserves the original's
join fan-outs, selectivities, and value distributions exactly; non-key
columns are untouched. nation/region stay fixed (as in TPC-H, where they
are scale-invariant). Each copy lands in its own parquet part-file so both
engines get parallel scans.

This is NOT the driver's generator — results at sfK are not comparable to a
hypothetical driver-generated sfK. It doesn't need to be: the benchmark
compares Spark vs DuckDB on IDENTICAL files, so the ratio is fair at any
scale; replication only guarantees the workload's shape matches sf0.1.

Usage: python tools/gen_scale.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=<repo>/benchdata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: key columns to offset per table: {table: {column: keyspace_table.column}}
#: (the keyspace is the table that OWNS the key, so FKs share its offset)
KEYS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
STATIC = ["nation", "region"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "benchdata", "sf1")
    con = duckdb.connect()
    con.execute("SET threads=16")

    # keyspace widths: offset unit = max(key) + 1 per owning table
    widths: dict[tuple[str, str], int] = {}
    for t, cols in KEYS.items():
        for col, owner in cols.items():
            if owner not in widths:
                ot, oc = owner
                widths[owner] = (
                    con.execute(
                        f"SELECT max({oc}) + 1 FROM read_parquet('{src}/{ot}.parquet')"
                    ).fetchone()[0]
                )

    for t in STATIC:
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{d}/copy_00.parquet' (FORMAT PARQUET)"
        )
        print(t, "static")

    for t, cols in KEYS.items():
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        schema = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        for i in range(k):
            proj = ", ".join(
                f"{c} + {i * widths[cols[c]]} AS {c}" if c in cols else c
                for c in schema
            )
            con.execute(
                f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{d}/copy_{i:02d}.parquet' (FORMAT PARQUET)"
            )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(t, n, "rows in", k, "files")


if __name__ == "__main__":
    main()
