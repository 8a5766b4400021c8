"""Size-aware join-strategy selection for fact-fact joins.

Joining two fact tables admits no broadcast (either side may be unbounded:
the registry-wide invariant is that no raw fact ever sits under a static
``BroadcastExchange``).  Between the two co-partitioned strategies the right
pick depends on data size — exactly the call a cost-based planner makes
from catalog statistics:

- **sort-merge join** is the only always-safe choice at 100 TB: it spills
  gracefully on both sides and never materializes a hash map of an
  unbounded input;
- **shuffled hash join** does the same co-partitioned join *without sorting
  either side*, and wins whenever every post-shuffle build partition fits
  comfortably in a task's memory (DuckDB itself always hash-joins at the
  benchmark scales for the same reason).

We make the decision from the source directory's total parquet size — the
same statistic a table catalog would hold.  Shuffled-hash is chosen only
when every concurrent build on an executor fits its share of the heap
(per-partition bytes x concurrent tasks x decode/skew headroom <= heap);
otherwise we fall back to sort-merge.  The
``HDS_FACT_JOIN_STRATEGY`` environment variable overrides the choice for
experiments (``merge`` | ``shuffle_hash``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: decoded-bytes-per-compressed-byte for parquet (~4x). No additional skew
#: factor: ``dir_bytes`` is the WHOLE directory while a join builds one
#: column-pruned table (>=4x smaller on TPC-H shapes), which already
#: over-budgets by more than any residual average-case skew, and runtime
#: skew is AQE's job (skew-join splitting caps the worst partition). The
#: safe aggregate of concurrent hash builds per executor heap is
#: heap / _SHJ_HEAP_DIVISOR compressed bytes.
_SHJ_HEAP_DIVISOR = 4

_DIR_BYTES_CACHE: dict[str, int] = {}


def dir_bytes(sf_dir: str) -> int:
    """Total bytes of parquet data under ``sf_dir`` (memoized per path)."""
    cached = _DIR_BYTES_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    _DIR_BYTES_CACHE[sf_dir] = total
    return total


def _shuffle_partitions() -> int:
    """The session's post-shuffle parallelism (conservative default)."""
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            return max(int(s.conf.get("spark.sql.shuffle.partitions")), 1)
    except Exception:
        pass
    return 1


def _mem_bytes(spec: str) -> int:
    """Parse a Spark memory string (``8g``, ``512m``, ``1024``) to bytes."""
    spec = spec.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if spec and spec[-1] == "b":
        spec = spec[:-1]
    if spec and spec[-1] in mult:
        return int(float(spec[:-1]) * mult[spec[-1]])
    return int(float(spec))


def _heap_and_concurrency() -> tuple[int, int]:
    """(executor heap bytes, concurrent tasks sharing that heap).

    In ``local[N]`` mode all N task threads share the driver heap; on a
    cluster it is ``spark.executor.cores / spark.task.cpus`` tasks inside
    ``spark.executor.memory``. Falls back to (8 GiB, cpu_count) when no
    session is active — the conservative direction (more sharers, small
    heap) only ever demotes to the always-safe sort-merge.
    """
    heap, tasks = 8 << 30, os.cpu_count() or 8
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            master = s.conf.get("spark.master", "")
            task_cpus = max(int(s.conf.get("spark.task.cpus", "1")), 1)
            if master.startswith("local"):
                heap = _mem_bytes(s.conf.get("spark.driver.memory", "1g"))
                inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "1"
                tasks = (os.cpu_count() or 8) if inner in ("*", "") else int(inner)
            else:
                heap = _mem_bytes(s.conf.get("spark.executor.memory", "1g"))
                tasks = max(int(s.conf.get("spark.executor.cores", "1")), 1)
            tasks = max(tasks // task_cpus, 1)
    except Exception:
        pass
    return heap, tasks


def fact_join_strategy(sf_dir: str) -> str:
    """``shuffle_hash`` when every post-shuffle build fits, else ``merge``.

    The safety condition is per-EXECUTOR, not per-task: an executor runs
    ``tasks`` concurrent non-spilling hash builds inside one heap, and the
    builds live in the unified execution-memory region (roughly half the
    heap: ``spark.memory.fraction`` 0.6, shared with the probe side and
    shuffle buffers) — so the aggregate decoded build must fit heap/2.
    """
    override = os.environ.get("HDS_FACT_JOIN_STRATEGY")
    if override in ("merge", "shuffle_hash"):
        return override
    # AQE (the session default) may coalesce post-shuffle partitions into
    # FEWER, larger ones than configured, so a concurrent build can exceed
    # dir_bytes/configured_partitions. Cap the effective divisor by the
    # partition count AQE's coalescing floor would leave: it never merges a
    # partition past advisoryPartitionSizeInBytes (64 MB default), so at
    # least dir_bytes/advisory partitions survive coalescing.
    parts = _shuffle_partitions()
    advisory = 64 << 20
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            advisory = _mem_bytes(
                s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
            )
            if s.conf.get("spark.sql.adaptive.enabled", "true") != "true":
                advisory = 0  # AQE off → configured count holds exactly
    except Exception:
        pass
    if advisory:
        parts = min(parts, max(1, -(-dir_bytes(sf_dir) // advisory)))
    per_partition = dir_bytes(sf_dir) / parts
    heap, tasks = _heap_and_concurrency()
    return "shuffle_hash" if per_partition * tasks * _SHJ_HEAP_DIVISOR <= heap // 2 else "merge"


def fact_hint(df: DataFrame, sf_dir: str) -> DataFrame:
    """Hint ``df`` as the non-stream side of a fact-fact join.

    Never a broadcast: the returned hint is one of the two co-partitioned
    strategies, picked by :func:`fact_join_strategy` from source size.
    """
    return df.hint(fact_join_strategy(sf_dir))
