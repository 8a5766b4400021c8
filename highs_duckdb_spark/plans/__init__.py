"""Physical-plan auditing: assertions that the plans Catalyst produces are
the plans a 100-TB deployment needs (pushdown reached the scan, small dims
broadcast, top-k avoided a full sort, codegen fused the hot path)."""

from highs_duckdb_spark.plans.audit import (
    formatted_plan,
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "wholestage_codegen_spans",
]
