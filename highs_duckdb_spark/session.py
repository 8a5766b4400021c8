"""SparkSession construction and test-table loading.

Scale notes (100 TB design): the session defaults below are tuned for the
local[32] test harness but every knob is the one you would tune on a real
cluster — AQE on (runtime re-planning, skew-join splitting, partition
coalescing), a shuffle-partition count sized to the parallelism, and Arrow
enabled so any pandas-UDF path is batch-vectorized rather than row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def get_spark(app_name: str = "highs_duckdb_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE is enabled so that at real scale Spark re-plans at runtime:
    coalescing post-shuffle partitions, converting sort-merge joins to
    broadcast when a side turns out small, and splitting skewed partitions.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    # Shuffle partitioning is sized to the workload, not the core count: the
    # test/bench datasets are a few hundred MB at most, where ≤8 post-shuffle
    # partitions minimize task-scheduling overhead (measured ~2× end-to-end).
    # On a real cluster against 100 TB you'd raise this into the thousands
    # (or rely on AQE's initialPartitionNum + coalescing); it's one knob.
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")) or min(
        8, max(4, cpus // 4)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local mode: no data locality to wait for; avoids scheduler stalls
        .config("spark.locality.wait", "0s")
        # testdata dims are MBs; on a real cluster leave this at the 10MB
        # default and let AQE upgrade joins from runtime sizes instead
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in load_table (µs precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # local mode: the driver hosts every Arrow result; the 1g cluster
        # default aborts legitimate large materializations (q30 at sf100
        # returns ~4.5M rows ≈ 1 GiB serialized once partition count rises)
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def ensure_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Required before any pandas-UDF / applyInPandas stage: cloudpickle
    serializes module-level kernels by reference, so executors must be able
    to import ``highs_duckdb_spark`` even when the driver process found it
    through a cwd/sys.path entry the workers don't share.
    """
    sc = spark.sparkContext
    if getattr(sc, "_highs_duckdb_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="hds_pyfiles_"), "highs_duckdb_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "highs_duckdb_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._highs_duckdb_spark_shipped = True


#: reader-DataFrame cache: file listing + footer schema read cost ~100ms per
#: spark.read.parquet call; reusing the immutable reader DataFrame avoids
#: paying it once per query. Keyed by applicationId so entries from stopped
#: sessions can never be served to a new one.
_READER_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: explicit layout overrides (sources/layout.py): point a logical table at a
#: bucketed/sort-clustered catalog table instead of the raw parquet path —
#: the local analog of repointing a production catalog entry at a new
#: storage layout. Consulted by load_table BEFORE the reader cache.
_TABLE_OVERRIDES: dict[tuple[str, str, str], DataFrame] = {}


def set_table_override(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame
) -> None:
    """Serve ``df`` for ``load_table(spark, name, sf_dir)`` in this session."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    _TABLE_OVERRIDES[(spark.sparkContext.applicationId, sf_dir, name)] = df


def clear_table_overrides(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    for key in [k for k in _TABLE_OVERRIDES if k[0] == app]:
        del _TABLE_OVERRIDES[key]


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one synthetic table (TESTDATA.md) as a DataFrame.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown freedom:
    filters and column pruning reach the parquet scan (`PushedFilters` /
    `ReadSchema` in `.explain`), and partition pruning applies unchanged when
    the path is a partitioned directory tree at real scale.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    override = _TABLE_OVERRIDES.get(key)
    if override is not None:
        return override
    cached = _READER_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); an externally-supplied
        # SparkSession (e.g. the driver's) won't have the legacy conf, so set
        # it here — it is a runtime-settable SQLConf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): surfaced as long nanos under
    # spark.sql.legacy.parquet.nanosAsLong — convert to a µs timestamp here so
    # every consumer sees a proper TimestampType column.
    if name == "events":
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer div: ns ≈ 1.7e18 overflows double's exact range, so no float math
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _READER_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several tables and register each as a temp view of the same name."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
