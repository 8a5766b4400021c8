"""Stream/batch equivalence for the ops without a SQL oracle."""

from __future__ import annotations

import pytest

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


def test_foreachbatch_parquet_sink(spark):
    """Streaming ETL write path: foreachBatch lands each micro-batch as
    parquet; the landed data equals the batch aggregation."""
    import tempfile
    import pyspark.sql.functions as FF
    from highs_duckdb_spark.streaming.windows import read_events_stream

    out_dir = tempfile.mkdtemp(prefix="hds_febatch_")
    stream = read_events_stream(spark, SF)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .agg(FF.count("*").alias("n"))
    )

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()
    landed = {(r["event_type"], r["n"]) for r in spark.read.parquet(out_dir).collect()}
    expected = {
        (r["event_type"], r["n"])
        for r in load_table(spark, "events", SF).groupBy("event_type").agg(FF.count("*").alias("n")).collect()
    }
    assert landed == expected


def test_transform_with_state_running_totals(spark):
    """qs07 (transformWithState, RocksDB store) vs the batch aggregate.

    Skipped where pyspark's protobuf dependency is absent (the
    TransformWithStateInPySpark driver worker needs google.protobuf); the
    operator registers itself only when runnable."""
    from highs_duckdb_spark.operators.streaming_ops import (
        _transform_with_state_available,
        qs07_stream_running_totals,
    )

    if not _transform_with_state_available():
        pytest.skip("google.protobuf not installed; transformWithState worker cannot start")
    got = {
        (r["event_type"], r["n_events"], r["total_value"])
        for r in qs07_stream_running_totals(spark, SF).collect()
    }
    ev = load_table(spark, "events", SF)
    exp = {
        (r["event_type"], r["n"], r["tv"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9)
                + F.sum(F.col("value").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("tv"),
        )
        .collect()
    }
    assert got == exp
