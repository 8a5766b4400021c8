"""Storage-layout levers (sources/layout.py): bucketed catalog attach,
partition-banded top-k, and the layout-aware q65 join order must all be
result-identical to the plain paths, with the plan properties that justify
them asserted from the physical plan."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from highs_duckdb_spark.operators.registry import QUERIES
from highs_duckdb_spark.session import clear_table_overrides, load_table
from highs_duckdb_spark.sources import layout as L

SF = "/root/testdata/sf0.001"


@pytest.fixture
def layout_dir(spark):
    d = tempfile.mkdtemp(prefix="hds_layout_test_")
    try:
        yield d
    finally:
        clear_table_overrides(spark)
        for table, _src, _b, _s in L._all_specs():
            ident = L._table_ident(d, table)
            spark.sql(f"DROP TABLE IF EXISTS {ident}")
        for name in L.JOIN_PROJECTION_SPECS:
            spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(d, name)}")
        shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_attach_bucketed_joins_without_fact_exchange(spark, layout_dir):
    paths = L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert set(paths) == {t for t, _src, _b, _s in L._all_specs()} | set(
        L.JOIN_PROJECTION_SPECS
    )
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plan = _plan(joined)
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_attach_bucketed_results_equal_plain(spark, layout_dir):
    plain = {
        tuple(r)
        for r in QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF).collect()
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    bucketed = {
        tuple(r)
        for r in QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF).collect()
    }
    assert plain == bucketed


def test_q65_layout_aware_join_order_kicks_in(spark, layout_dir):
    """With the layout attached, q65 matches the lineitem_orders
    projection: projection ⋈ customer, both custkey-bucketed, so no
    input-fact hash exchange survives (only the tiny final n_name
    aggregation's)."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert L.layout_active(spark, SF)
    plan = _plan(QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF))
    # the projection scans bucketed (customer may legitimately plan as a
    # broadcast at tiny SF, which skips its bucketed read)
    assert plan.count("Bucketed: true") >= 1, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    # neither base fact is rescanned: the materialization replaces both
    # (match on scan locations — "/orders]" can't false-positive against
    # the projection's ".../lineitem_orders]" path)
    assert "/lineitem]" not in plan and "/orders]" not in plan, plan
    assert "lineitem.parquet" not in plan and "orders.parquet" not in plan, plan


def test_registration_survives_new_session_semantics(spark, layout_dir):
    """register_bucketed_tables over EXISTING files (the fresh-session
    path: CREATE TABLE ... CLUSTERED BY ... LOCATION) must restore bucket
    metadata — drop the catalog entries, re-register, and the join is
    still exchange-free."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    clear_table_overrides(spark)
    for table, _src, _b, _s in L._all_specs():
        spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(layout_dir, table)}")
    idents = L.register_bucketed_tables(spark, layout_dir, buckets=4)
    bo = spark.table(idents["orders"])
    bl = spark.table(idents["lineitem"])
    joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plan = _plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    # and the data round-trips exactly
    assert bo.count() == load_table(spark, "orders", SF).count()


def test_banded_orders_counts_and_pruning(spark):
    d = tempfile.mkdtemp(prefix="hds_band_test_")
    try:
        path = L.build_banded_orders(spark, SF, d)
        counts = L.read_band_counts(path)
        assert sum(counts.values()) == load_table(spark, "orders", SF).count()
        # band monotonicity: every row of band b prices within its range
        banded = spark.read.parquet(path)
        bad = banded.filter(
            (F.col("price_band") < L.PRICE_BANDS - 1)
            & (
                (F.col("o_totalprice") < F.col("price_band") * L.PRICE_BAND_WIDTH)
                | (F.col("o_totalprice") >= (F.col("price_band") + 1) * L.PRICE_BAND_WIDTH)
            )
        ).count()
        assert bad == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_q42_banded_equals_plain_topk(spark):
    # layout built EXPLICITLY (the query itself is read-only now)
    L.build_banded_orders(spark, SF)
    plain = [tuple(r) for r in QUERIES["q42_topk"].builder(spark, SF).collect()]
    banded = [tuple(r) for r in QUERIES["q42_topk_banded"].builder(spark, SF).collect()]
    assert plain == banded
    plan = _plan(QUERIES["q42_topk_banded"].builder(spark, SF))
    # zone-map plan: the price threshold is PUSHED to the parquet scan so
    # row groups below it are footer-skipped
    assert "GreaterThanOrEqual(o_totalprice" in plan, plan


def test_q42_banded_without_layout_falls_back_to_plain(spark, tmp_path):
    """READ-ONLY contract: with no built layout the query must neither
    write anything nor diverge from the plain top-k (driver correctness
    runs never pay a layout build — VERDICT r04 item 8)."""
    from highs_duckdb_spark.sources import layout as LL

    # point the default layout dir somewhere empty via monkey layout_dir
    path = LL.banded_orders_path(SF, str(tmp_path))
    assert path is None
    plain = [tuple(r) for r in QUERIES["q42_topk"].builder(spark, SF).collect()]
    import unittest.mock as mock

    with mock.patch.object(LL, "default_layout_dir", lambda _s: str(tmp_path)):
        banded = [
            tuple(r) for r in QUERIES["q42_topk_banded"].builder(spark, SF).collect()
        ]
        # no build happened
        assert not (tmp_path / "orders_banded").exists()
    assert plain == banded


def test_banded_layout_invalidates_on_source_change(spark, tmp_path):
    """Fingerprint guard (ADVICE r04): a layout built from different source
    bytes under the same basename must not be served."""
    d = str(tmp_path / "layout")
    path = L.build_banded_orders(spark, SF, d)
    assert L.banded_orders_path(SF, d) == path
    # same layout dir, different source dataset (sf0.01) → stale
    assert L.banded_orders_path("/root/testdata/sf0.01", d) is None


def test_topk_plan_guarantee_and_pruning(spark, tmp_path):
    """stats.topk_plan unit properties on a freshly built banded layout:
    the returned (files, threshold) guarantee ≥ k rows above threshold and
    prune files whose max is below it."""
    from highs_duckdb_spark.sources import stats as zstats

    d = str(tmp_path / "layout")
    path = L.build_banded_orders(spark, SF, d)
    stats = zstats.read_sidecar(path)
    assert stats is not None and stats["files"]
    files, t = zstats.topk_plan(stats, path, "o_totalprice", 25)
    all_files = [f["path"] for f in stats["files"]]
    assert 0 < len(files) <= len(all_files)
    if t is not None:
        n_above = (
            spark.read.parquet(*files)
            .filter(F.col("o_totalprice") >= F.lit(t))
            .count()
        )
        assert n_above >= 25
        # completeness: no row above t lives outside the chosen files
        full = spark.read.parquet(path).filter(F.col("o_totalprice") >= F.lit(t)).count()
        assert full == n_above


def test_scan_for_keys_bypasses_unhelpful_clustering(spark, layout_dir):
    """An aggregation whose shuffle keys are disjoint from the bucket keys
    must scan the SOURCE copy (the override can only cost combine
    locality), while a covered key keeps the bucketed scan — and results
    are identical either way."""
    plain = {
        tuple(r) for r in QUERIES["q20_distinct_agg"].builder(spark, SF).collect()
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    # disjoint keys: source scan (no bucket metadata in the plan)
    df = L.scan_for_keys(spark, SF, "lineitem", "l_partkey")
    assert "Bucketed: true" not in _plan(df.groupBy("l_partkey").count())
    # covered key: bucketed scan preserved
    df_b = L.scan_for_keys(spark, SF, "lineitem", "l_orderkey")
    assert "Bucketed: true" in _plan(df_b.groupBy("l_orderkey").count())
    # the registered query picks the source copy and matches byte-for-byte
    q20 = QUERIES["q20_distinct_agg"].builder(spark, SF)
    assert "Bucketed: true" not in _plan(q20)
    assert {tuple(r) for r in q20.collect()} == plain


def test_join_projection_q64_results_and_plan(spark, layout_dir):
    """q64 matches the projection too (it carries l_shipdate and
    o_orderpriority for exactly this): same results, no base-fact scan."""
    plain = [
        tuple(r)
        for r in QUERIES["q64_tpch_q3_shipping_priority"].builder(spark, SF).collect()
    ]
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    df = QUERIES["q64_tpch_q3_shipping_priority"].builder(spark, SF)
    plan = _plan(df)
    assert "lineitem.parquet" not in plan and "orders.parquet" not in plan, plan
    assert [tuple(r) for r in df.collect()] == plain


def test_join_projection_makes_q65_fact_tree_exchange_free(spark, layout_dir):
    """With the lineitem_orders projection attached, q65 is projection ⋈
    customer (both custkey-bucketed): ZERO input-fact hash exchanges — the
    only one left is the tiny final n_name aggregation — and results match
    the normalized plan byte-for-byte."""
    plain = {
        tuple(r)
        for r in QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF).collect()
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert L.join_projection(spark, SF, "lineitem_orders") is not None
    df = QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert {tuple(r) for r in df.collect()} == plain
    # projection rows = lineitem rows (inner FK join is lossless)
    proj = L.join_projection(spark, SF, "lineitem_orders")
    assert proj.count() == load_table(spark, "lineitem", SF).count()
    # detach: registry cleared, q65 back on the normalized plan
    clear_table_overrides(spark)
    assert L.join_projection(spark, SF, "lineitem_orders") is None


def test_q178_pruned_range_equals_plain_and_prunes(spark, tmp_path):
    """files_for_range: with the banded layout built, q178 reads only the
    files whose [min,max] intersects the price range — and is
    byte-identical to the plain filtered aggregate."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    d = str(tmp_path / "layout")
    plain = [
        tuple(r) for r in QUERIES["q178_price_range_pruned"].builder(spark, SF).collect()
    ]
    path = L.build_banded_orders(spark, SF, d)
    stats = zstats.read_sidecar(path)
    pruned_files = zstats.files_for_range(
        stats, path, "o_totalprice", lo=300_000.0, hi=400_000.0
    )
    all_files = stats["files"]
    assert 0 < len(pruned_files) < len(all_files)  # real pruning happened
    with mock.patch.object(L, "default_layout_dir", lambda _s: d):
        got = [
            tuple(r)
            for r in QUERIES["q178_price_range_pruned"].builder(spark, SF).collect()
        ]
    assert got == plain
