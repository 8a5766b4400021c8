"""Stream/batch equivalence for the ops without a SQL oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from highs_duckdb_spark.operators.streaming_ops import qs02_stream_sliding
from highs_duckdb_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_sliding_windows_match_batch(spark):
    """Streamed 2h/1h sliding counts == batch computation (each event
    belongs to exactly two windows: its hour's and the previous hour's)."""
    streamed = {
        (r["window_start"], r["n"]) for r in qs02_stream_sliding(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    batch = (
        ev.select(F.explode(F.array(
            F.date_trunc("hour", F.col("ts")),
            F.date_trunc("hour", F.col("ts")) - F.expr("INTERVAL 1 HOUR"),
        )).alias("window_start"))
        .groupBy("window_start")
        .agg(F.count("*").alias("n"))
    )
    expected = {(r["window_start"], r["n"]) for r in batch.collect()}
    assert streamed == expected
