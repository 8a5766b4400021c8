#!/usr/bin/env python
"""Decompose the per-query latency floor at small SF (VERDICT r05 item 7).

The sf0.1 gap to DuckDB on sub-100 ms queries is dominated by a fixed
per-query cost. This probe splits that floor into its parts for a set of
floor-bound queries:

- ``construct``: the builder call alone — Python-side plan construction
  (Py4J round trips) + Catalyst ANALYSIS, no execution;
- ``fresh``: best-of-N of construct + execute (what bench.py measures and
  what the driver harness pays — each call re-builds the DataFrame);
- ``reuse``: best-of-N of re-materializing ONE pre-built DataFrame —
  execution only (optimization + physical planning + codegen + run still
  happen per action; only construction/analysis is amortized).

``fresh - reuse ≈ construct`` cross-checks the decomposition. The delta is
what a prepared-statement / plan cache could legitimately save; whether to
add one is a separate decision recorded in BENCH_SCALING.md — bench.py
keeps calling builders fresh either way (DuckDB re-parses per execute, so
fresh-vs-fresh is the fair comparison).

Usage: python tools/floor_probe.py [sf_dir] [runs] [q1,q2,...]

The optional third arg overrides the default probe set — used round 11 to
decompose the corpus100x LLM-pipeline headliners (s05/s20/p09), whose
sub-second protocol ratios are floor-dominated at the 107 MB corpus.
Warm-up skips tables the directory doesn't have (corpus dirs hold only
documents/embeddings).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "s01_cosine_topk",
    "q11_join_multiway",
    "q42_topk",
    "q07_global_agg",
    "q80_asof_join",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    probes = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBES

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, load_table, tune_for_data
    from highs_duckdb_spark.session import TABLES

    spark = get_spark("floor-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # same latency-mode confs as bench.py so the floors are comparable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    tune_for_data(spark, sf_dir)
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, t, sf_dir).groupBy().count().collect()

    def mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    for name in probes:
        spec = QUERIES[name]
        mat(spec.builder(spark, sf_dir))  # steady state
        t_construct = min(
            _timed(lambda: spec.builder(spark, sf_dir)) for _ in range(runs)
        )
        t_fresh = min(
            _timed(lambda: mat(spec.builder(spark, sf_dir))) for _ in range(runs)
        )
        df = spec.builder(spark, sf_dir)
        mat(df)
        t_reuse = min(_timed(lambda: mat(df)) for _ in range(runs))
        print(
            f"{name:28s} construct={t_construct * 1e3:7.1f}ms "
            f"fresh={t_fresh * 1e3:7.1f}ms reuse={t_reuse * 1e3:7.1f}ms "
            f"construct_share={t_construct / t_fresh * 100:5.1f}%",
            flush=True,
        )
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
