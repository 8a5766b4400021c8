"""Source/sink connectors: format round-trips and partitioned layouts.

The reference inherits its storage layer from DuckDB (parquet/CSV readers,
CTAS — SURVEY.md §2.2); here the equivalents are Spark DataSource V2
readers/writers. The ops registered in
:mod:`highs_duckdb_spark.operators.sources_ops` prove the full write→read
cycle per format and that partition layouts prune at the scan.
"""

from highs_duckdb_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    write_partitioned_parquet,
)

__all__ = ["read_csv", "read_json", "read_orc", "write_partitioned_parquet"]
