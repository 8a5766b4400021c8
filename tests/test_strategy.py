"""Unit tests for the fact-fact join-strategy pick (plans/strategy.py).

The r02 review found the per-partition budget ignored per-executor task
concurrency: 250 MB/partition passed the old <=256 MB cap, yet an 8-core
8 GiB executor would run 8 concurrent ~1 GB decoded hash builds and OOM.
The condition is now per-executor: partition_bytes x concurrent_tasks x
decode_factor must fit the execution-memory half of the heap.
"""

from __future__ import annotations

import highs_duckdb_spark.plans.strategy as st


def test_mem_bytes_parsing():
    assert st._mem_bytes("8g") == 8 << 30
    assert st._mem_bytes("512m") == 512 << 20
    assert st._mem_bytes("24G") == 24 << 30
    assert st._mem_bytes("1024k") == 1 << 20
    assert st._mem_bytes("2048") == 2048
    assert st._mem_bytes("1gb") == 1 << 30


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("HDS_FACT_JOIN_STRATEGY", "merge")
    assert st.fact_join_strategy("/nonexistent") == "merge"
    monkeypatch.setenv("HDS_FACT_JOIN_STRATEGY", "shuffle_hash")
    assert st.fact_join_strategy("/nonexistent") == "shuffle_hash"


def _decide(monkeypatch, total_bytes, partitions, heap, tasks):
    monkeypatch.delenv("HDS_FACT_JOIN_STRATEGY", raising=False)
    monkeypatch.setattr(st, "dir_bytes", lambda _d: total_bytes)
    monkeypatch.setattr(st, "_shuffle_partitions", lambda: partitions)
    monkeypatch.setattr(st, "_heap_and_concurrency", lambda: (heap, tasks))
    return st.fact_join_strategy("ignored")


def test_concurrency_demotes_to_merge(monkeypatch):
    # the review's scenario: 50 GB dir, 200 partitions, 8-core 8 GiB
    # executor -> 250 MB x 8 tasks x 4 decode = 8 GB of concurrent builds
    # in an 8.6 GiB heap; must demote to the always-safe sort-merge
    assert _decide(monkeypatch, 50_000_000_000, 200, 8 << 30, 8) == "merge"
    # same data, single-task executor: 250 MB x 1 x 4 = 1 GB fits heap/2
    assert _decide(monkeypatch, 50_000_000_000, 200, 8 << 30, 1) == "shuffle_hash"


def test_small_data_stays_shuffle_hash(monkeypatch):
    # sf0.1-like: 17 MB over 32 partitions, 32 tasks, 8 GiB heap
    assert _decide(monkeypatch, 17 << 20, 32, 8 << 30, 32) == "shuffle_hash"


def test_heap_scales_the_budget(monkeypatch):
    # sf10-like 2.4 GB dir: unsafe on the 8 GiB library default,
    # safe on the 24 GiB bench heap
    gb24 = 24 << 30
    assert _decide(monkeypatch, 2_400_000_000, 32, 8 << 30, 32) == "merge"
    assert _decide(monkeypatch, 2_400_000_000, 32, gb24, 32) == "shuffle_hash"
