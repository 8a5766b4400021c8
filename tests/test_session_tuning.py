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
