"""Edge-case pins on synthetic micro-data the generated testdata may not
cover — each compares Spark against the DuckDB oracle on a purpose-built
table, so a lucky data distribution can't hide a semantics divergence."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from highs_duckdb_spark.operators import QUERIES
from tests.oracle_harness import compare

BASE = "/root/testdata/sf0.001"


def _dir_with_events(pdf: pd.DataFrame) -> str:
    d = tempfile.mkdtemp()
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(BASE, f), os.path.join(d, f))
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_q99_exclude_current_single_row_partition_is_null(spark):
    """A single-event user has an EMPTY excluded frame: DuckDB's native
    EXCLUDE CURRENT ROW sums it to NULL, and the sum-minus-self rewrite
    must yield NULL too — not (x - x) / 1 = 0.0."""
    d = _dir_with_events(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-02 09:00"]
                ),
                "user_id": [7, 3, 3],
                "event_type": ["view"] * 3,
                "value": [3.5, 1.25, 2.0],
                "props": ["{}"] * 3,
            }
        )
    )
    spec = QUERIES["q99_window_exclude_current"]
    ok, msg = compare(spec.builder(spark, d), spec.oracle, d)
    assert ok, msg
    rows = {r.event_id: r.peer_avg for r in spec.builder(spark, d).collect()}
    assert rows[1] is None  # the single-event user
    assert rows[2] is not None and rows[3] is not None


def test_hll_sketch_rollup_tolerance_and_merge(spark):
    """q116's merged-sketch estimates stay within 5% of the exact distinct
    counts, and merging daily sketches equals sketching the whole column
    directly (associativity — the property that makes rollups incremental)."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.operators.relational5 import q116_hll_sketch_rollup
    from highs_duckdb_spark.session import load_table

    sf = "/root/testdata/sf0.01"
    est = {r["event_type"]: r["est_users"] for r in q116_hll_sketch_rollup(spark, sf).collect()}
    ev = load_table(spark, "events", sf)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t in exact:
        assert abs(est[t] - exact[t]) <= 0.05 * exact[t], (t, est[t], exact[t])
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert est == direct  # union-of-daily == direct sketch
