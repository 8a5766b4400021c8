"""Cheap total ordering for small final results.

A global ``orderBy`` plans a range exchange whose partitioner SAMPLES the
child — an extra Spark job per query that re-executes the plan segment
above the last shuffle. For a final result of a few (thousand) rows that
is pure overhead: ``coalesce(1)`` + a partition-local sort yields the same
total order in the main job itself, with one reduce task instead of a
sample job + N sorted tasks.

Use ONLY where the pre-sort result is small (aggregated/top-k outputs):
``coalesce`` collapses everything above the last shuffle boundary into a
single task, so applying it to a large or compute-heavy final stage would
serialize real work. Large ordered outputs keep ``orderBy`` (range
partitioning is exactly right at 100 TB, where the output itself is
cluster-sized and the sample pass is amortized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def present_sorted(df: DataFrame, *cols) -> DataFrame:
    """Totally-ordered single-partition presentation of a SMALL result."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def present_sorted_after_barrier(df: DataFrame, *cols) -> DataFrame:
    """Single-partition ordered presentation of a small-to-medium result
    that a HEAVY parallel stage produces.

    ``repartition(1)`` plans an explicit exchange, so — unlike
    ``present_sorted``'s ``coalesce(1)``, which collapses everything above
    the last shuffle into one task — the producing stage keeps its full
    parallelism and only the finished rows funnel into the single sorting
    task. Costs one tiny exchange; avoids serializing the producer
    (d03_full's 10M-pair Jaccard verification at the 100x corpus ran on
    ONE core under coalesce(1): 178 s, vs ~46 s parallel)."""
    return df.repartition(1).sortWithinPartitions(*cols)


def ordered_wide(df: DataFrame, *cols) -> DataFrame:
    """Totally-ordered presentation of a result that SCALES WITH THE DATA.

    A parallel range-partitioned sort: the sample pass costs one extra
    small job, but the sort itself uses every core and — unlike
    ``present_sorted`` — never collapses the upstream pipeline onto a
    single task (coalesce(1) above a per-row computation serialized t05's
    whole regex+md5 pipeline: measured 4.5 s -> 0.9 s at sf10)."""
    return df.orderBy(*cols)
