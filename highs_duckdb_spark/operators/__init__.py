"""Operator suite: every query the engine declares, with its DuckDB oracle.

Modules register queries into :data:`highs_duckdb_spark.operators.registry.QUERIES`
at import time; ``__spark_entry__`` exposes them to the driver contract.
"""

from highs_duckdb_spark.operators.registry import QUERIES, QuerySpec, all_queries, all_oracles

# Import for side effects: each module registers its queries.
from highs_duckdb_spark.operators import relational  # noqa: E402,F401
from highs_duckdb_spark.operators import relational2  # noqa: E402,F401
from highs_duckdb_spark.operators import text  # noqa: E402,F401
from highs_duckdb_spark.operators import dedup  # noqa: E402,F401
from highs_duckdb_spark.operators import similarity  # noqa: E402,F401
from highs_duckdb_spark.operators import optimization  # noqa: E402,F401
from highs_duckdb_spark.operators import streaming_ops  # noqa: E402,F401
from highs_duckdb_spark.operators import sources_ops  # noqa: E402,F401
from highs_duckdb_spark.operators import multimodal  # noqa: E402,F401
from highs_duckdb_spark.operators import scalar_fns  # noqa: E402,F401
from highs_duckdb_spark.operators import vectors  # noqa: E402,F401
from highs_duckdb_spark.operators import clustering  # noqa: E402,F401
from highs_duckdb_spark.operators import tpch_extra  # noqa: E402,F401
from highs_duckdb_spark.operators import tpch_extra2  # noqa: E402,F401
from highs_duckdb_spark.operators import merge_ops  # noqa: E402,F401
from highs_duckdb_spark.operators import relational3  # noqa: E402,F401
from highs_duckdb_spark.operators import relational4  # noqa: E402,F401
from highs_duckdb_spark.operators import pipeline_ops  # noqa: E402,F401
from highs_duckdb_spark.operators import graph_ops  # noqa: E402,F401
from highs_duckdb_spark.operators import relational5  # noqa: E402,F401
from highs_duckdb_spark.operators import relational6  # noqa: E402,F401
from highs_duckdb_spark.operators import text2  # noqa: E402,F401
from highs_duckdb_spark.operators import relational7  # noqa: E402,F401
from highs_duckdb_spark.operators import text3  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "all_queries", "all_oracles"]
