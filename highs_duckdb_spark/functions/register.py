"""Register engine functions into a SparkSession's SQL namespace.

After ``register_all(spark)`` a SQL user can run the reference's smoke
queries verbatim (reference: test_extension.sql:7-8,
network_flow_example.sql:8):

    SELECT highs_version('Sam');
    SELECT highs_openssl_version('Michael');

Scalar banners are plain Python UDFs (cold path, one row); everything
performance-sensitive in this engine is builtin-expression based and needs
no registration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from highs_duckdb_spark.optim.registry import highs_openssl_version, highs_version
from highs_duckdb_spark.session import ensure_shipped


def register_all(spark: SparkSession) -> None:
    """Register every SQL-surface function: the two scalar banners AND the
    four table functions (highs_create_variables / highs_create_constraints /
    highs_set_coefficients / highs_solve)."""
    from highs_duckdb_spark.functions.udtf import register_table_functions

    # the UDFs are module-level functions → pickled by reference → executors
    # must be able to import this package
    ensure_shipped(spark)
    spark.udf.register("highs_version", highs_version, "string")
    spark.udf.register("highs_openssl_version", highs_openssl_version, "string")
    register_table_functions(spark)
