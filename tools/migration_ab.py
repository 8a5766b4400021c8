#!/usr/bin/env python
"""A/B timing for the JoinGraph-migrated queries (round 6) against an
older checkout — evidence that deleting the hand-written join trees did
not regress the plans at a scale where join strategy matters.

Runs the NAMED queries from whichever repo root is first on sys.path (pass
it via PYTHONPATH or run from the checkout), so the same script times both
sides: the current tree and a `git worktree` of the previous round.

Usage: PYTHONPATH=<repo-or-worktree> python tools/migration_ab.py SF_DIR [runs]
Prints one `name seconds` line per query (min over runs).
"""

from __future__ import annotations

import os
import sys
import time

QUERIES_AB = [
    "q96_large_volume_customers",
    "q97_dormant_balances",
    "q100_order_priority_check",
    "q101_volume_shipping",
    "q102_market_share",
    "q103_product_profit",
    "q104_returned_items",
    "q105_shipping_delay_buckets",
    "q106_customer_order_histogram",
    "q107_promo_revenue",
    "q108_top_supplier",
    "q109_small_quantity_revenue",
    "q110_disjunctive_filter",
    "q12_semi_join",
    "q13_anti_join",
    "q14_outer_join",
]


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, load_table, tune_for_data
    from highs_duckdb_spark.session import TABLES

    spark = get_spark("migration-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    tune_for_data(spark, sf_dir)
    for t in TABLES:
        load_table(spark, t, sf_dir).groupBy().count().collect()

    def mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    names = [n for n in QUERIES_AB if n in QUERIES]
    for name in names:  # untimed steady-state sweep
        mat(QUERIES[name].builder(spark, sf_dir))
    total = 0.0
    for name in names:
        spec = QUERIES[name]
        mat(spec.builder(spark, sf_dir))
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(spec.builder(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name:34s} {best:7.3f}s", flush=True)
    print(f"{'TOTAL':34s} {total:7.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
