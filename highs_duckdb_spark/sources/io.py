"""Format readers/writers with scale-correct defaults.

Notes for 100 TB:

- Always pass an explicit schema to CSV/JSON readers — schema inference
  reads the data twice.
- Partitioned parquet layouts (``partitionBy``) give free partition
  pruning: a filter on the partition column eliminates whole directories
  at planning time (visible as ``PartitionFilters`` in the scan node).
- ``maxRecordsPerFile`` caps file sizes so downstream scans parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], max_records_per_file: int = 5_000_000
) -> None:
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
