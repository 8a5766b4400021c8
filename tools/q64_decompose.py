#!/usr/bin/env python
"""q64 (TPC-H Q3) decomposition at scale — the largest comparable sf100
ratio (1.87x) without a committed stage split. Under the bucketed layout
Spark serves the query from the lineitem_orders projection (pre-joined,
custkey-clustered) while DuckDB re-joins the raw tables, so the engines'
physical work differs by design; the attribution that matters is
SPARK-side: where do the ~6 s go?

Stages (layout attached, bench-protocol latency session, best-of-RUNS):

1. projection scan floor: lineitem_orders with BOTH date filters, the 6
   q64 columns decoded into a trivial hash-sum aggregate
2. + group/top-k: same scan, grouped revenue by orderkey, top-10 — no
   customer join
3. full q64 (QUERIES builder: CBO tree, customer semi side, runtime
   filters)

DuckDB reference: its full oracle plus its own raw-scan floor (lineitem
+ orders decode of the same logical columns, both filters).

Usage: python tools/q64_decompose.py SF_DIR [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

O_FILTER = "o_orderdate < TIMESTAMP '1998-03-15'"
L_FILTER = "l_shipdate > TIMESTAMP '1998-03-15'"
COLS = "l_orderkey, l_extendedprice, l_discount, o_custkey, o_orderdate, o_orderpriority"


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    import duckdb

    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, tune_for_data
    from highs_duckdb_spark.sources.layout import attach_bucketed, join_projection

    spark = get_spark(
        "q64-decompose", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    attach_bucketed(spark, sf_dir)
    proj = join_projection(spark, sf_dir, "lineitem_orders")
    assert proj is not None, "layout must be built first (tools/build_layout.py)"
    proj.createOrReplaceTempView("lo")

    def _best(fn) -> float:
        fn()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def _mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    scan = _best(
        lambda: _mat(
            spark.sql(
                f"SELECT sum(hash({COLS})) AS h, count(*) AS n FROM lo "
                f"WHERE {O_FILTER} AND {L_FILTER}"
            )
        )
    )
    print(f"spark proj scan floor        {scan:7.3f}s", flush=True)

    agg = _best(
        lambda: _mat(
            spark.sql(
                f"""SELECT l_orderkey,
                       round(1e-9 + sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
                       o_orderdate, o_orderpriority
                FROM lo WHERE {O_FILTER} AND {L_FILTER}
                GROUP BY l_orderkey, o_orderdate, o_orderpriority
                ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""
            )
        )
    )
    print(f"spark + group/top10 (no cust) {agg:7.3f}s", flush=True)

    full = _best(lambda: _mat(QUERIES["q64_tpch_q3_shipping_priority"].builder(spark, sf_dir)))
    print(f"spark full q64               {full:7.3f}s", flush=True)
    print(
        f"split: scan={scan:.3f}s agg/topk=+{agg-scan:.3f}s cust-join=+{full-agg:.3f}s",
        flush=True,
    )

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/**/*.parquet', hive_partitioning=0)"
        ) if os.path.isdir(f"{sf_dir}/{t}.parquet") and any(
            os.scandir(f"{sf_dir}/{t}.parquet")
        ) else con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # decode ALL six q64 columns, matching the Spark floor (review r11:
    # a single-column hash lets projection pushdown skip 4 of the 6)
    d_cols = " + ".join(
        f"CAST(hash({c.strip()}) % 1000003 AS BIGINT)" for c in COLS.split(",")
    )
    d_scan = _best(
        lambda: con.execute(
            f"""SELECT sum({d_cols}), count(*)
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE {O_FILTER} AND {L_FILTER}"""
        ).fetchall()
    )
    print(f"duckdb raw join+scan floor   {d_scan:7.3f}s", flush=True)
    d_full = _best(
        lambda: con.execute(QUERIES["q64_tpch_q3_shipping_priority"].oracle).fetchall()
    )
    print(f"duckdb full q64              {d_full:7.3f}s", flush=True)
    print(f"ratios: full={full/d_full:.2f}x  spark-scan/duck-full={scan/d_full:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
