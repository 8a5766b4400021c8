#!/usr/bin/env python
"""Streaming throughput evidence (VERDICT r09 item 7): rows/s and
per-cycle latency for the two streaming classes at a real SF.

- **qs19_stream_mv_maintenance** — the full fact streamed through 3
  AvailableNow micro-batches, each batch appended to the live table AND
  incrementally folded into the rev_by_nation_year aggregate MV. We
  instrument ``layout.refresh_agg_mv`` (driver-side, called from
  foreachBatch) to time every refresh cycle: per-cycle latency should be
  FLAT across cycles — the delta-bound cost contract pinned structurally
  by tests/test_layout.py::test_agg_mv_refresh_cost_is_delta_bound_* —
  while a rebuild-per-batch implementation would grow ~linearly with the
  accumulated fact.
- **qs03_stream_sessionize** — the stateful class
  (applyInPandasWithState): events streamed with watermarks, rows/s =
  events rows / wall.

Usage: python tools/stream_bench.py SF_DIR [runs]
Prints one line per metric; commit the table to BENCH_SCALING.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, load_table, tune_for_data
    from highs_duckdb_spark.sources import layout as L

    spark = get_spark(
        "stream-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)

    n_fact = load_table(spark, "lineitem", sf_dir).count()
    n_events = load_table(spark, "events", sf_dir).count()

    # --- qs19: per-cycle refresh latency via a driver-side timing wrapper
    real_refresh = L.refresh_agg_mv
    cycles: list[float] = []

    def timed_refresh(*a, **kw):
        t0 = time.perf_counter()
        out = real_refresh(*a, **kw)
        cycles.append(time.perf_counter() - t0)
        return out

    L.refresh_agg_mv = timed_refresh
    try:
        best_wall, best_cycles = float("inf"), None
        for _ in range(runs):
            cycles.clear()
            t0 = time.perf_counter()
            QUERIES["qs19_stream_mv_maintenance"].builder(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            if wall < best_wall:
                best_wall, best_cycles = wall, list(cycles)
    finally:
        L.refresh_agg_mv = real_refresh
    print(
        f"qs19 wall={best_wall:.3f}s fact_rows={n_fact} "
        f"rows_per_s={n_fact / best_wall:,.0f}",
        flush=True,
    )
    for i, c in enumerate(best_cycles or [], 1):
        print(f"qs19 refresh cycle {i}: {c:.3f}s", flush=True)
    if best_cycles and len(best_cycles) >= 2:
        print(
            f"qs19 cycle flatness last/first = "
            f"{best_cycles[-1] / best_cycles[0]:.2f}",
            flush=True,
        )

    # --- qs03: stateful sessionization throughput
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES["qs03_stream_sessionize"].builder(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    print(
        f"qs03 wall={best:.3f}s event_rows={n_events} "
        f"rows_per_s={n_events / best:,.0f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
