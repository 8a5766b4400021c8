#!/usr/bin/env python
"""q01 decomposition at scale (VERDICT r10 item 6): the pricing summary is
the largest remaining comparable ratio (1.60x at sf100) without a
committed split. Separate the three cost layers, same-session best-of-RUNS
for BOTH engines on identical files:

1. scan+filter floor: the 7 agg columns decoded + the shipdate filter +
   a trivial (sum of longs) aggregate — parquet decode dominates
2. plain-agg: q01's exact group-by shape but raw double sums (no cents
   kernel) — adds the 2-key hash agg
3. full q01: adds the exact integer-cents kernel (functions/money.py)

DuckDB runs the analogous three. The deltas attribute the ratio: decode
floor vs agg vs cents-kernel cost. Usage:
  python tools/q01_decompose.py SF_DIR [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILTER = "l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
COLS = "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus"


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    import duckdb
    import pyspark.sql.functions as F

    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, load_table, tune_for_data

    spark = get_spark(
        "q01-decompose", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    # bench-protocol session shape (bench.py): latency mode at this scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    li = load_table(spark, "lineitem", sf_dir)
    li.createOrReplaceTempView("lineitem")

    def probe_scan():
        # decode all 7 columns; cheap long sums defeat column pruning
        # without adding real agg cost
        return spark.sql(
            f"""SELECT sum(hash({COLS})) AS h, count(*) AS n
                FROM lineitem WHERE {FILTER}"""
        )

    def probe_agg():
        return spark.sql(
            f"""SELECT l_returnflag, l_linestatus,
                       sum(l_quantity) AS sq, sum(l_extendedprice) AS sp,
                       sum(l_extendedprice * (1 - l_discount)) AS sdp,
                       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sc,
                       avg(l_quantity) AS aq, avg(l_extendedprice) AS ap,
                       avg(l_discount) AS ad, count(*) AS n
                FROM lineitem WHERE {FILTER}
                GROUP BY l_returnflag, l_linestatus
                ORDER BY l_returnflag, l_linestatus"""
        )

    def probe_full():
        return QUERIES["q01_pricing_summary"].builder(spark, sf_dir)

    def _mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    def _best(fn) -> float:
        _mat(fn())
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _mat(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    s_scan, s_agg, s_full = _best(probe_scan), _best(probe_agg), _best(probe_full)
    print(
        f"spark  scan={s_scan:7.3f}s  plain-agg={s_agg:7.3f}s  full={s_full:7.3f}s"
        f"  (agg-cost={s_agg - s_scan:+.3f}s cents-cost={s_full - s_agg:+.3f}s)",
        flush=True,
    )

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    path = f"{sf_dir}/lineitem.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")

    def d_best(sql: str) -> float:
        con.execute(sql).fetch_arrow_table()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            best = min(best, time.perf_counter() - t0)
        return best

    d_scan = d_best(
        f"""SELECT sum(hash({COLS})) AS h, count(*) AS n
            FROM lineitem WHERE {FILTER}"""
    )
    d_agg = d_best(
        f"""SELECT l_returnflag, l_linestatus,
                   sum(l_quantity), sum(l_extendedprice),
                   sum(l_extendedprice * (1 - l_discount)),
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
                   avg(l_quantity), avg(l_extendedprice), avg(l_discount),
                   count(*)
            FROM lineitem WHERE {FILTER}
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""
    )
    d_full = d_best(QUERIES["q01_pricing_summary"].oracle)
    print(
        f"duckdb scan={d_scan:7.3f}s  plain-agg={d_agg:7.3f}s  full={d_full:7.3f}s"
        f"  (agg-cost={d_agg - d_scan:+.3f}s decimal-cost={d_full - d_agg:+.3f}s)",
        flush=True,
    )
    print(
        f"ratios: scan={s_scan / d_scan:5.2f}x plain-agg={s_agg / d_agg:5.2f}x "
        f"full={s_full / d_full:5.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
