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
same statistic a table catalog would hold.  Below ``_SHJ_MAX_BYTES`` even a
pathological all-rows-one-key skew fits in a single task's memory, so the
hash build is trivially safe; above it we fall back to sort-merge.  The
``HDS_FACT_JOIN_STRATEGY`` environment variable overrides the choice for
experiments (``merge`` | ``shuffle_hash``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: compressed source bytes PER POST-SHUFFLE PARTITION under which a hash
#: build trivially fits in a task's memory: 256 MB compressed is ~1 GB
#: decoded — comfortably inside a default 8 GiB heap even under 4x key
#: skew. The safety condition for shuffled-hash is per-partition, not
#: per-table: what a build task holds is total/shuffle-partitions (AQE's
#: skew splitting further caps the worst partition on a real cluster).
_SHJ_PARTITION_BUDGET = 256 << 20

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


def fact_join_strategy(sf_dir: str) -> str:
    """``shuffle_hash`` when every post-shuffle build fits, else ``merge``."""
    override = os.environ.get("HDS_FACT_JOIN_STRATEGY")
    if override in ("merge", "shuffle_hash"):
        return override
    per_partition = dir_bytes(sf_dir) / _shuffle_partitions()
    return "shuffle_hash" if per_partition <= _SHJ_PARTITION_BUDGET else "merge"


def fact_hint(df: DataFrame, sf_dir: str) -> DataFrame:
    """Hint ``df`` as the non-stream side of a fact-fact join.

    Never a broadcast: the returned hint is one of the two co-partitioned
    strategies, picked by :func:`fact_join_strategy` from source size.
    """
    return df.hint(fact_join_strategy(sf_dir))
