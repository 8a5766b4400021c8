"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every operator the engine claims is registered here with a callable
``(spark, sf_dir) -> DataFrame`` and, where ANSI-SQL-expressible, a DuckDB
oracle string over the same parquet tables. The driver hash-compares the
two at sf0.01 (CORRECTNESS gate, BASELINE.md).

Determinism conventions (so the DuckDB/Spark value-hash comparison is
stable despite floating-point summation order differing between engines):

- every aggregate over doubles is wrapped in ``round(·, k)`` on BOTH sides
  (sums of money-scale values → 2, averages/ratios → 4, similarities → 6);
- computed integer columns are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` returns HUGEINT and its date parts return BIGINT while
  Spark returns int — explicit casts align the schemas);
- every output column is explicitly aliased, identically in both engines;
- ties in top-k / window orderings are broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    category: str = "relational"
    doc: str = ""
    # driver_visible=False keeps an entry out of the driver-graded
    # queries()/oracle_sql() surface while pytest still exercises it via
    # QUERIES. Reserved for capabilities whose OUTPUT is engine-specific by
    # nature (native HLL++/t-digest sketches, RNG TABLESAMPLE): each such
    # entry names its deterministic hash-checked twin in its doc, and its
    # statistical contract (error bounds, determinism) is pinned in pytest.
    driver_visible: bool = True


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    category: str = "relational",
    doc: str = "",
    driver_visible: bool = True,
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            category=category,
            doc=doc or (fn.__doc__ or ""),
            driver_visible=driver_visible,
        )
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in QUERIES.items() if spec.driver_visible}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.driver_visible and spec.oracle is not None
    }
