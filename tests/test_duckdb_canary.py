"""Canary for the DuckDB numeric assumptions the hash-checked ANN family
rests on (ADVICE r04: similarity.py:483).

s02/s04/s08/s11/v04 oracles replay Python float64 kernels inside DuckDB and
hash-compare exact bits. That is only sound while DuckDB's
``list_dot_product`` accumulates STRICTLY LEFT-TO-RIGHT in float64 with no
FMA and no pairwise/SIMD re-association — the same fold numpy-free Python
and the Spark-side kernels use. A DuckDB upgrade that vectorizes the fold
would flip sign bits / argmin ties across the whole family at once; this
file makes that failure ONE targeted test instead of a suite-wide mystery.
"""

from __future__ import annotations

import duckdb

# products are [1e16, 1, -1e16, 1]:
#   left-to-right: ((1e16 + 1) + -1e16) + 1 = (1e16 + -1e16) + 1 = 1.0
#       (the +1 is absorbed: float64 spacing at 1e16 is 2)
#   pairwise/SIMD: (1e16 + 1) + (-1e16 + 1) = 1e16 + -9999999999999998 = 2.0
#   FMA (exact products don't differ here, but an FMA of the running sum
#       keeps the absorbed +1): also != 1.0
LTR_PROBE = ([1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0], 1.0)

# products are [1, 1e16, -1e16, 1]:
#   left-to-right: ((1 + 1e16) + -1e16) + 1 = 1.0   (leading 1 absorbed)
#   right-to-left: ((1 + -1e16) + 1e16) + 1 = 3.0
RTL_PROBE = ([1.0, 1e16, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0], 1.0)


def _dot(u, v) -> float:
    con = duckdb.connect()
    lu = ", ".join(f"{x!r}::DOUBLE" for x in u)
    lv = ", ".join(f"{x!r}::DOUBLE" for x in v)
    (out,) = con.execute(f"SELECT list_dot_product([{lu}], [{lv}])").fetchone()
    return out


def test_list_dot_product_folds_left_to_right_no_pairwise():
    u, v, expect = LTR_PROBE
    got = _dot(u, v)
    assert got == expect, (
        f"DuckDB list_dot_product no longer folds left-to-right in plain "
        f"float64 (got {got!r}, expected {expect!r}): the s02/s04/s08/s11/"
        f"v04 oracle replays are invalid under this DuckDB build."
    )


def test_list_dot_product_not_right_to_left():
    u, v, expect = RTL_PROBE
    got = _dot(u, v)
    assert got == expect, (
        f"DuckDB list_dot_product fold direction changed (got {got!r}): "
        f"re-derive the ANN oracle replay kernels."
    )


def test_python_reference_fold_matches():
    # the Spark-side kernels accumulate dimension-sequentially in float64;
    # pin that the Python fold agrees with the probes' expected values
    for u, v, expect in (LTR_PROBE, RTL_PROBE):
        acc = 0.0
        for a, b in zip(u, v):
            acc += a * b
        assert acc == expect
