"""Data-driven shuffle-partition sizing (session.tune_for_data).

VERDICT r04 item 3: the sf-ladder measured by the bench (6 at sf0.1, 16 at
sf1, 32 at sf10, 128 at sf100 — the q30 external-sort spill fix) is an
ENGINE lever, so it lives in the library now; bench.py only calls it.
"""

from __future__ import annotations

from highs_duckdb_spark.session import shuffle_partitions_for_bytes, tune_for_data

MB = 1 << 20
GB = 1 << 30


def test_measured_ladder_points():
    # the four measured dataset sizes map to the swept optima
    assert shuffle_partitions_for_bytes(17 * MB) == 6  # sf0.1
    assert shuffle_partitions_for_bytes(240 * MB) == 16  # sf1
    assert shuffle_partitions_for_bytes(2_395 * MB) == 32  # sf10
    assert 64 <= shuffle_partitions_for_bytes(24 * GB) <= 192  # sf100 regime


def test_growth_is_bounded_per_partition():
    # beyond the measured range the count tracks data size: a partition
    # never exceeds ~192 MB compressed, and the count is capped
    n = shuffle_partitions_for_bytes(500 * GB)  # below the count cap
    assert (500 * GB) / n <= 192 * MB
    assert shuffle_partitions_for_bytes(1 << 50) == 4096  # cap


def test_monotone_nondecreasing():
    sizes = [1 * MB, 90 * MB, 120 * MB, 900 * MB, 5 * GB, 20 * GB, 200 * GB]
    parts = [shuffle_partitions_for_bytes(s) for s in sizes]
    assert parts == sorted(parts)


def test_tune_for_data_sets_session_confs(spark):
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            "spark.sql.files.maxPartitionBytes",
        )
    }
    try:
        n = tune_for_data(spark, "/root/testdata/sf0.001")
        assert n == 6  # sub-100MB dataset
        assert spark.conf.get("spark.sql.shuffle.partitions") == "6"
        assert (
            spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
            == "6"
        )
        # small-data split-size rule applied
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "2m"
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_native_bloom_thresholds_stay_spark_defaults(spark):
    """Round 10 (VERDICT r09 item 4): tuning Spark's InjectRuntimeFilter
    thresholds to fire on q64's big edge was a measured NEGATIVE at sf100
    (+7.7%, BENCH_SCALING) — the session must keep the engine defaults so
    the bloom continues NOT to fire there. Guards against a future
    'optimization' re-tuning them without re-measuring."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )
        == "10485760b"
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold"
        )
        == "10737418240b"
    )


# --- local_rows_df semantics guards (ADVICE r11 / VERDICT r11 item 8) -------


def test_local_rows_df_preserves_nan_as_non_null(spark):
    """A float NaN cell must stay a NON-NULL NaN (the classic
    createDataFrame semantics), not become NULL via pandas' NaN-as-missing
    coercion on the Arrow fast path (ADVICE r11, medium)."""
    import math

    from highs_duckdb_spark.session import local_rows_df

    rows = local_rows_df(
        spark, [("x", float("nan")), ("y", 1.5)], "k string, v double"
    ).collect()
    by_k = {r["k"]: r["v"] for r in rows}
    assert by_k["x"] is not None and math.isnan(by_k["x"])
    assert by_k["y"] == 1.5


def test_local_rows_df_restores_arrow_conf(spark):
    """local_rows_df must not permanently flip the caller's
    arrow.pyspark.enabled conf (ADVICE r11, low)."""
    from highs_duckdb_spark.session import local_rows_df

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = local_rows_df(spark, [(1, "a")], "i bigint, s string")
        assert df.collect() == [(1, "a")]
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.set(key, prior)


def test_local_rows_df_nested_ddl(spark):
    """Nested/parameterized DDL types must parse via the real DDL parser
    (a naive comma split mangles them — VERDICT r11 item 8) and still take
    the Arrow fast path: the plan must be a LocalTableScan, not a
    parallelized-RDD scan."""
    from decimal import Decimal

    from highs_duckdb_spark.session import local_rows_df

    df = local_rows_df(
        spark,
        [([(1, 2)], Decimal("3.50"))],
        "pairs array<struct<a:int,b:int>>, amt decimal(10,2)",
    )
    [row] = df.collect()
    assert row["pairs"] == [(1, 2)] or [tuple(x) for x in row["pairs"]] == [(1, 2)]
    assert row["amt"] == Decimal("3.50")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "LocalTableScan" in plan, plan


# --- read_table_arrow: the shared driver-side kernel loader (r12) -----------


def test_read_table_arrow_matches_load_table_and_bounds(spark):
    """The driver-side pyarrow read must return the same rows as the
    distributed load_table scan (both sides of a kernel read one code
    path), honor pyarrow-style filters, and enforce max_rows as a loud
    guard, never a silent truncation (VERDICT r11 item 5)."""
    import pytest

    from highs_duckdb_spark.session import load_table, read_table_arrow

    sf = "/root/testdata/sf0.001"
    t = read_table_arrow(
        spark, "embeddings", sf, columns=["vec_id"], filters=[("vec_id", "<", 20)]
    )
    spark_ids = sorted(
        r["vec_id"]
        for r in load_table(spark, "embeddings", sf)
        .filter("vec_id < 20")
        .select("vec_id")
        .collect()
    )
    assert sorted(t["vec_id"].to_pylist()) == spark_ids
    with pytest.raises(ValueError, match="max_rows"):
        read_table_arrow(spark, "embeddings", sf, columns=["vec_id"], max_rows=3)


def test_read_table_arrow_honors_table_override(spark):
    """With a layout override attached, the driver-side read must serve the
    OVERRIDE's rows — the kernel and the distributed scan may never see
    different data (ADVICE r11)."""
    from highs_duckdb_spark.session import (
        clear_table_overrides,
        load_table,
        read_table_arrow,
        set_table_override,
    )

    sf = "/root/testdata/sf0.001"
    ov = load_table(spark, "embeddings", sf).filter("vec_id < 7")
    set_table_override(spark, sf, "embeddings", ov)
    try:
        t = read_table_arrow(spark, "embeddings", sf, columns=["vec_id"])
        assert sorted(t["vec_id"].to_pylist()) == list(range(7))
        t2 = read_table_arrow(
            spark, "embeddings", sf, columns=["vec_id"], filters=[("vec_id", "<", 3)]
        )
        assert sorted(t2["vec_id"].to_pylist()) == [0, 1, 2]
    finally:
        clear_table_overrides(spark)
