"""Scalar-function parity entries (reference: test_extension.sql:7-8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions import register_all
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.optim.registry import SOLVER_VERSION


@register(
    "q08_scalar_functions",
    oracle=f"""
    SELECT 'Hello Sam, HiGHS version: {SOLVER_VERSION}' AS banner,
           true AS openssl_ok
    """,
    category="relational",
    doc=(
        "Scalar function call in a projection via the registered SQL UDF "
        "(reference: test_extension.sql:7-8; checked with ILIKE like "
        "test/sql/highs.test:15-23)."
    ),
)
def q08_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    return spark.sql(
        """
        SELECT highs_version('Sam') AS banner,
               highs_openssl_version('Michael') ILIKE '%openssl%' AS openssl_ok
        """
    )
