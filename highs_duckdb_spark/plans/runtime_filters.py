"""Planner-integrated bloom runtime filters (VERDICT r08 item 2).

Generalizes q114's bloom semi-join reduction
(operators/relational5.py:69) into the :class:`~highs_duckdb_spark.
plans.cbo.JoinGraph` planner: when one side of an equi-join edge is
SELECTIVE and its post-filter key set fits a bounded bloom filter, the
planner builds the filter JVM-side (xxhash64 bit positions, ``bit_or``
with map-side partial aggregation, a driver collect bounded by the
filter's WORD COUNT — never by build cardinality) and pushes the
membership predicate onto the probe side's scan, cutting the probe's
shuffle / pre-aggregation input to roughly the build side's key
fraction before any exchange forms.

Why not Spark's native ``InjectRuntimeFilter``: the built-in rule only
fires above a 10 GiB application-side scan
(``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``)
and sizes from fixed expectations (1M items) — it cannot see this
planner's footer-sidecar NDV/selectivity statistics, and it records no
decline reasons. The reference inherits the equivalent from DuckDB's
hash join, which pushes build-side filters into probe scans natively
(SURVEY.md §4.2); here the planner emits the literal-array predicate
itself, sized from estimated build keys, with machine-readable declines
(``explain.rf_declines``) when the statistics say it can't pay.

Soundness: the predicate is a conservative SUPERSET test (false
positives only, the exact join removes them — q114's oracle proves the
pattern), so it is valid on any probe side whose rows must equi-match
the build side to survive: fact-fact INNER edges and inner/semi dims.
Outer/anti joins keep probe rows WITHOUT a match and are never
filtered. NULL probe keys never equi-match, so dropping them is sound
on the gated join types. Filters compose: building one filter from an
already-bloom-filtered side stays sound because every filtered set is a
superset of the keys that survive its own joins.

100-TB shape: the filter is a fixed-budget literal array in the plan
(≤ ``RF_MAX_BITS``/8 bytes, broadcast once per stage with the task
binary), the build is one column-pruned pass over the selective side,
and the probe predicate is three JVM hashes per row inside whole-stage
codegen — no Python, no per-task driver traffic, no growth with data
size. What grows with scale is exactly the saved probe volume.
"""

from __future__ import annotations

import math
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: k hash functions = the seeds (q114's geometry, kept so both
#: implementations stay bit-comparable in tests)
BLOOM_SEEDS = (0x5EED0, 0x5EED1, 0x5EED2)


def geometry(
    n_keys: float, bits_per_key: float, min_bits: int, max_bits: int
) -> tuple[int, float]:
    """Pick the power-of-two bit count for ``n_keys`` and return it with
    the expected false-positive rate. ``m`` must be a power of two so
    ``pmod(xxhash64, m)`` is uniform; the cap makes the plan-literal
    budget explicit — past it the fp rate (and so the pass-rate gate)
    declines the filter rather than growing the plan."""
    m = int(min_bits)
    while m < max_bits and m < n_keys * bits_per_key:
        m <<= 1
    k = len(BLOOM_SEEDS)
    fp = (1.0 - math.exp(-k * float(n_keys) / m)) ** k
    return m, fp


def _positions(col, m: int):
    """The k bit positions of ``col`` — JVM-side xxhash64 so build and
    probe agree with zero Python hashing in either path."""
    return [F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m)) for s in BLOOM_SEEDS]


def build_words(df: DataFrame, key: str, m: int) -> list[int]:
    """Build the filter: OR the per-key bits into 64-bit words JVM-side
    (``bit_or`` with map-side partial aggregation) — the collect is
    ≤ ``m``/64 rows however many build rows there are."""
    word_rows = (
        df.select(F.explode(F.array(*_positions(F.col(key), m))).alias("p"))
        .select(
            (F.col("p") / F.lit(64)).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in word_rows:
        words[int(r["w"])] = int(r["bits"])
    return words


def might_contain(words: list[int], m: int, col):
    """The pushed probe predicate — ONE literal-array expression
    (a per-element ``F.lit`` comprehension costs a Py4J round trip per
    element; ``F.lit(list)`` is one call), three hashes, three getbits,
    all inside whole-stage codegen."""
    bits = F.lit(words).cast("array<bigint>")
    checks = [
        F.getbit(
            F.element_at(bits, (h / F.lit(64)).cast("int") + 1),
            h % F.lit(64),
        )
        == 1
        for h in _positions(col, m)
    ]
    return reduce(lambda a, b: a & b, checks)
