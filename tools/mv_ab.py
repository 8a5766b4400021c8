#!/usr/bin/env python
"""A/B worker for layout-attached plan levers (round 8: aggregate MVs).

One PROCESS per arm (fresh JVM — no cross-arm cache pollution): the arm
is selected by environment (HDS_DISABLE_AGG_MV=1 for the lazy/projection
arm), the layout is attached OUTSIDE timing (protocol-equivalent: builds
are one-time), and each query reports min-over-N of steady-state runs.

Usage:
  [HDS_DISABLE_AGG_MV=1] python tools/mv_ab.py SF_DIR RUNS q65... [more...]
Prints one `name seconds` line per query.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2])
    names = sys.argv[3:]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, tune_for_data
    from highs_duckdb_spark.sources.layout import attach_bucketed, build_banded_orders

    spark = get_spark("mv-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    attach_bucketed(spark, sf_dir)
    build_banded_orders(spark, sf_dir)

    def mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    for name in names:  # untimed warmup sweep
        mat(QUERIES[name].builder(spark, sf_dir))
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(QUERIES[name].builder(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best:7.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
