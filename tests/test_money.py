"""Property tests for the integer-cents money fast path: the BIGINT-cents
sum must equal the DECIMAL sum cast to DOUBLE for any 2-decimal inputs in
the engine's exact window (functions/money.py)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# 2-decimal money grid like the testdata columns (TESTDATA.md): values in
# cents up to 10^7 (1e5 dollars), lists up to a few hundred rows
money_cents = st.integers(min_value=0, max_value=10_000_000)


@given(st.lists(money_cents, min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_cents_sum_equals_decimal_sum_as_double(cents_list):
    total_cents = sum(cents_list)  # what the BIGINT sum computes
    dec_total = sum(Decimal(c) / 100 for c in cents_list)  # DECIMAL(12,2) sum
    assert total_cents / 100.0 == float(dec_total)


@given(st.lists(st.tuples(money_cents, st.integers(0, 10), st.integers(0, 8)), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_product_cents_sum_matches_decimal(rows):
    """sum(price*(1-disc)*(1+tax)) — scale-6 integer form vs decimal form."""
    int_total = sum(p * (100 - d) * (100 + t) for p, d, t in rows)
    dec_total = sum(
        (Decimal(p) / 100) * (1 - Decimal(d) / 100) * (1 + Decimal(t) / 100)
        for p, d, t in rows
    )
    assert int_total / 1e6 == float(dec_total)


def test_spark_cents_matches_decimal_on_lineitem(spark):
    """End-to-end: the q01 cents aggregation equals the decimal aggregation
    bit-for-bit on real data."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.functions.money import cents
    from highs_duckdb_spark.session import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(4,2)")
    fast = li.agg(
        (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 1e4).alias("v")
    ).collect()[0]["v"]
    slow = li.agg(
        F.sum(dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(4,2)")))
        .cast("double")
        .alias("v")
    ).collect()[0]["v"]
    assert fast == slow


def test_floor_cents_equals_round_cents_on_all_money_columns(spark):
    """The floor(x*10^k + 0.5) fast path must agree with round(x*10^k) on
    every money/ratio column — a regenerated dataset with >k-decimal or
    pathological negative values would surface here, not as a silent
    oracle mismatch."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.session import load_table

    money_cols = {
        "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "part": ["p_retailprice"],
        "supplier": ["s_acctbal"],
        "customer": ["c_acctbal"],
        "events": ["value"],
    }
    for tbl, cols in money_cols.items():
        df = load_table(spark, tbl, "/root/testdata/sf0.001")
        present = [c for c in cols if c in df.columns]
        for c in present:
            n = df.filter(
                F.round(F.col(c) * 100).cast("bigint")
                != F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")
            ).count()
            assert n == 0, f"{tbl}.{c}: {n} rows where floor-cents != round-cents"
