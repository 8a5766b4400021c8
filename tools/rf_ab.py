#!/usr/bin/env python
"""A/B worker for planner bloom runtime filters (round 9).

One PROCESS per arm (fresh JVM): arm selected by environment
(HDS_DISABLE_RUNTIME_FILTERS=1 for the baseline arm), optional
HDS_AB_LAYOUT=1 attaches the bucketed layout + sidecars outside timing
(the sf100 protocol's configuration). The shipped planner filter is a
lazy broadcast left-semi reduction (cbo._apply_runtime_filters): the
semi-join key-set build/broadcast executes lazily inside the timed
materialization — there is no plan-time job — so timed reps still
charge the filter its full cost.

Usage:
  [HDS_DISABLE_RUNTIME_FILTERS=1] [HDS_AB_LAYOUT=1] \
      python tools/rf_ab.py SF_DIR RUNS q64... [more...]
Prints one `name seconds` line per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2])
    names = sys.argv[3:]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, tune_for_data

    spark = get_spark("rf-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    if os.environ.get("HDS_AB_LAYOUT"):
        from highs_duckdb_spark.sources.layout import (
            attach_bucketed,
            build_banded_orders,
        )

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
