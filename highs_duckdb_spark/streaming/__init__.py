"""Structured Streaming operators over the ``events`` stream.

The reference has no streaming surface (SURVEY.md §2.2: "streaming of any
kind" is unexercised), but the north star asks for stream processing as a
first-class capability. Everything here is idiomatic Structured Streaming:
``readStream`` file source → event-time windows with watermarks →
``writeStream`` sinks, plus an ``applyInPandasWithState`` custom stateful
operator for gap-based sessionization.

Batch/stream parity: each streaming op has identical semantics to a batch
query over the same input, so the driver-facing entries run the stream with
``Trigger.AvailableNow`` into a memory sink and return the result — checked
against the same DuckDB oracle as the batch equivalent.
"""

from highs_duckdb_spark.streaming.windows import (
    read_events_stream,
    sessionize_stream,
    sliding_window_counts,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_counts",
    "sessionize_stream",
]
