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

import ssl

from pyspark.sql import SparkSession

from highs_duckdb_spark.optim.registry import SOLVER_VERSION


def register_all(spark: SparkSession) -> None:
    spark.udf.register(
        "highs_version",
        lambda name: f"Hello {name}, HiGHS version: {SOLVER_VERSION}",
        "string",
    )
    spark.udf.register(
        "highs_openssl_version",
        lambda name: (
            f"Hello {name}, the HiGHS extension is running with "
            f"OpenSSL version: {ssl.OPENSSL_VERSION}"
        ),
        "string",
    )
