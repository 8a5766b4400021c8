"""Bloom-filter kernels for explicit runtime-filter queries (q114).

These are the literal-array bloom primitives q114
(operators/relational5.py:69) demonstrates: build JVM-side (xxhash64
bit positions, ``bit_or`` with map-side partial aggregation, a driver
collect bounded by the filter's WORD COUNT), probe as one literal-array
predicate inside whole-stage codegen.

PLANNER INTEGRATION DOES NOT USE THESE — a measured negative (round 9):
Py4J converts a literal list element-wise at ~0.43 ms/element, so a
2^25-bit filter (524288 longs, the size a few million build keys need)
costs ~227 s of pure plan construction — three orders of magnitude over
the planner's whole floor. Literal blooms are only practical at q114's
fixed 2^16 bits (1024 words ≈ 0.4 s), which caps useful build sides at
a few thousand keys. The planner's runtime filters
(``JoinGraph._apply_runtime_filters``) therefore use a BROADCAST
LEFT-SEMI reduction against the build side's distinct keys instead:
lazy (no plan-time job), exact (zero false positives), pure public
DataFrame API, with the broadcast budget as the explicit cost knob.
Spark's own ``InjectRuntimeFilter`` covers the residual niche (build
key sets too big to broadcast probing 10 GiB+ scans) with an
engine-internal bloom, which is also what DuckDB's hash join gives the
reference natively (SURVEY.md §4.2).

Soundness of either form: the probe reduction is a superset test (the
semi join is exact; the bloom admits false positives the exact join
removes — q114's oracle proves that pattern), valid on any probe whose
rows must equi-match the build to survive (inner/semi), never on
outer/anti probes. NULL probe keys never equi-match, so dropping them
is sound on the gated join types.
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
