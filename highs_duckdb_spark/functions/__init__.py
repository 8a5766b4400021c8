"""SQL-function registration: expose the engine's functions to Spark SQL,
mirroring the reference extension's function registration
(reference: src/highs_extension.cpp:725-776)."""

from highs_duckdb_spark.functions.register import register_all
from highs_duckdb_spark.functions.udtf import register_table_functions

__all__ = ["register_all", "register_table_functions"]
