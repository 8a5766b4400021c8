"""Concurrent query execution on one SparkSession.

A shared engine serves many sessions at once; Spark's driver is
thread-safe for independent actions. This pins that our query builders —
including ones that register temp views or mutate the solver registry —
produce correct results under an 8-thread mixed workload (results must
equal the sequential baseline row-for-row)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from highs_duckdb_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"

# a mix that covers: plain DataFrame, temp-view-registering SQL, window,
# pandas-UDF (worker pool sharing), and the solver registry
MIX = [
    "q01_pricing_summary",
    "q09_scalar_subquery_projection",
    "q17_lateral_topn",
    "q30_window_rank",
    "q42_topk",
    "d04_simhash",
    "opt01_lp_reference_golden",
    "q69_recursive_cte",
]


def _rows(spark, name):
    df = QUERIES[name].builder(spark, SF)
    return [tuple(r) for r in df.collect()]


def test_concurrent_mixed_queries_match_sequential(spark):
    sequential = {name: _rows(spark, name) for name in MIX}
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = {
            (name, i): pool.submit(_rows, spark, name)
            for i in range(2)
            for name in MIX
        }
        for (name, _), fut in futures.items():
            assert fut.result() == sequential[name], f"{name} diverged under concurrency"
