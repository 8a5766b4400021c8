"""Planner-integrated bloom runtime filters (plans/runtime_filters.py,
JoinGraph._apply_runtime_filters — VERDICT r08 item 2).

q114 (tests/test_oracle_parity.py) already proves result equality of the
bloom-prefilter-then-exact-join pattern against the DuckDB oracle; these
tests pin the PLANNER integration: fire conditions, machine-readable
declines, soundness (no false negatives), composition with eager
aggregation, and the capture-mode no-jobs contract.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

import highs_duckdb_spark.plans.cbo as cbo
from highs_duckdb_spark.plans import runtime_filters as rfm
from highs_duckdb_spark.session import get_spark, load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


# --- kernel -----------------------------------------------------------------


def test_geometry_scales_and_caps():
    m0, fp0 = rfm.geometry(100, 12, 1 << 16, 1 << 25)
    assert m0 == 1 << 16 and fp0 < 0.001
    m1, _ = rfm.geometry(100_000, 12, 1 << 16, 1 << 25)
    assert m1 == 1 << 21  # next pow2 >= 1.2M bits
    m2, fp2 = rfm.geometry(100_000_000, 12, 1 << 16, 1 << 25)
    assert m2 == 1 << 25  # capped
    assert fp2 > 0.9  # overflowed filter passes ~everything -> gate declines


def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 1000).select(F.col("id").alias("k"))
    m, _ = rfm.geometry(1000, 12, 1 << 16, 1 << 25)
    words = rfm.build_words(build, "k", m)
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    kept = probe.filter(rfm.might_contain(words, m, F.col("k")))
    kept_ids = {r["k"] for r in kept.collect()}
    assert set(range(1000)) <= kept_ids  # every true key survives
    # and the filter actually filters: most of the disjoint half drops
    assert len(kept_ids) < 1400


# --- planner integration ----------------------------------------------------


def _q3_graph(spark):
    """The q64/TPC-H-Q3 shape: three fact-scale relations, two edges."""
    cust = load_table(spark, "customer", SF).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    cutoff = dt.datetime(1998, 3, 15)
    g = cbo.JoinGraph(spark, SF)
    g.fact("customer", cust, sel=0.2)
    g.fact(
        "orders",
        orders,
        sel=0.48,
        prepare=lambda df: df.filter(F.col("o_orderdate") < F.lit(cutoff)),
    )
    g.fact(
        "lineitem",
        li,
        sel=0.53,
        prepare=lambda df: df.filter(F.col("l_shipdate") > F.lit(cutoff)),
    )
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    return g


def test_rf_fires_and_result_unchanged(spark, monkeypatch):
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    g = _q3_graph(spark)
    df = g.plan()
    applied = {(p, pk, b, bk) for p, pk, b, bk, _m in g.explain.runtime_filters}
    # the selective customer side filters the orders probe, and the
    # date-filtered orders side filters the lineitem probe
    assert ("orders", "o_custkey", "customer", "c_custkey") in applied
    assert ("lineitem", "l_orderkey", "orders", "o_orderkey") in applied
    monkeypatch.setenv("HDS_DISABLE_RUNTIME_FILTERS", "1")
    g2 = _q3_graph(spark)
    df2 = g2.plan()
    assert g2.explain.runtime_filters == ()
    assert df.columns == df2.columns
    a = sorted(map(tuple, df.select("o_orderkey", "l_extendedprice").collect()))
    b = sorted(map(tuple, df2.select("o_orderkey", "l_extendedprice").collect()))
    assert a == b and len(a) > 0


def test_rf_declines_unselective_build(spark, monkeypatch):
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", load_table(spark, "orders", SF))  # sel=1.0
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.plan()
    assert g.explain.runtime_filters == ()
    reasons = dict(g.explain.rf_declines)
    assert reasons["orders->lineitem:l_orderkey"].startswith("build_sel:")


def test_rf_declines_benefit_floor_at_test_scale(spark):
    """At DEFAULT thresholds sf0.01 volumes never clear the 64 MB floor —
    the absolute-benefit gate that keeps the sub-second plan floor free
    of eager build jobs at bench sf0.1."""
    g = _q3_graph(spark)
    g.plan()
    assert g.explain.runtime_filters == ()
    assert any(r.startswith("benefit:") for _t, r in g.explain.rf_declines)


def test_rf_declines_broadcast_dim(spark, monkeypatch):
    """q10's shape: the filtered part dim broadcasts, so a bloom saves
    no exchange — pinned as a decline, not a filter."""
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    part = load_table(spark, "part", SF).filter(F.col("p_type") == "ECONOMY")
    g.dim(
        "part",
        part,
        after=("lineitem",),
        sel=0.2,
        on=("l_partkey", "p_partkey"),
    )
    g.plan()
    assert g.explain.runtime_filters == ()
    assert ("part->lineitem:l_partkey", "build_broadcasts") in g.explain.rf_declines


def test_rf_never_filters_outer_or_anti_probe(spark, monkeypatch):
    """Outer/anti dims keep probe rows WITHOUT a match — bloom-filtering
    the probe would drop rows the join must retain."""
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    for how in ("left", "anti"):
        g = cbo.JoinGraph(spark, SF)
        g.fact("customer", load_table(spark, "customer", SF))
        ords = load_table(spark, "orders", SF).filter(
            F.col("o_totalprice") > 100000
        )
        g.dim(
            "orders_probe",
            ords,
            after=("customer",),
            how=how,
            sel=0.3,
            fact_scale=True,
            on=("c_custkey", "o_custkey"),
        )
        g.plan()
        assert g.explain.runtime_filters == (), how
        reasons = dict(g.explain.rf_declines)
        assert reasons["orders_probe->customer:c_custkey"].startswith("join_type:")


def test_rf_demoted_inner_dim_fires(spark, monkeypatch):
    """A fact-scale (demoted) inner dim with a selective filter IS a
    valid build side: the co-partitioned join shuffles the probe, so the
    bloom cuts real exchange bytes. Result must equal the unfiltered
    plan's."""
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)

    def build(g):
        g.fact("lineitem", load_table(spark, "lineitem", SF))
        ords = load_table(spark, "orders", SF).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        g.dim(
            "orders",
            ords,
            after=("lineitem",),
            sel=0.2,
            fact_scale=True,
            on=("l_orderkey", "o_orderkey"),
        )
        return g.plan().agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))

    g = cbo.JoinGraph(spark, SF)
    r1 = build(g).collect()
    assert g.explain.runtime_filters != ()
    monkeypatch.setenv("HDS_DISABLE_RUNTIME_FILTERS", "1")
    g2 = cbo.JoinGraph(spark, SF)
    r2 = build(g2).collect()
    assert r1 == r2


def test_rf_composes_with_eager_agg(spark, monkeypatch):
    """The bloom lands BELOW the eager pre-aggregate: both rewrites fire
    on the q64 shape and the aggregate result is unchanged."""
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)

    def build(g):
        g.fact("orders", load_table(spark, "orders", SF), sel=0.3,
               prepare=lambda df: df.filter(F.col("o_totalprice") > 150000))
        g.fact("lineitem", load_table(spark, "lineitem", SF))
        g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
        g.aggregate(
            ("o_orderpriority",), {"q": ("sum", "l_quantity"), "n": ("count", "*")}
        )
        return g.plan()

    g = cbo.JoinGraph(spark, SF)
    r1 = sorted(map(tuple, build(g).collect()))
    assert g.explain.runtime_filters != ()
    assert g.explain.eager_agg != ()
    monkeypatch.setenv("HDS_DISABLE_RUNTIME_FILTERS", "1")
    monkeypatch.setenv("HDS_DISABLE_EAGER_AGG", "1")
    g2 = cbo.JoinGraph(spark, SF)
    r2 = sorted(map(tuple, build(g2).collect()))
    assert r1 == r2 and len(r1) > 0


def test_rf_skipped_under_capture(spark, monkeypatch):
    """Advisor capture BUILDS plans without executing them — the eager
    bloom collect must not run a job there."""
    monkeypatch.setattr(cbo, "RF_MIN_BENEFIT_BYTES", 0)
    monkeypatch.setattr(cbo, "RF_BROADCAST_COST_MULT", 0)
    from highs_duckdb_spark.plans.advisor import capture_workloads

    with capture_workloads() as sink:
        g = _q3_graph(spark)
        g.plan()
    assert g.explain.runtime_filters == ()
    assert g.explain.rf_declines == ()
    assert len(sink) == 1
