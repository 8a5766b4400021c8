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
    assert set(paths) == (
        {t for t, _src, _b, _s in L._all_specs()}
        | set(L.JOIN_PROJECTION_SPECS)
        | set(L.AGG_MV_SPECS)
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
    """With the layout attached, q65 rides the rev_by_nation_year
    AGGREGATE MV (round 8): one tiny group-grain file scan with the
    year window PUSHED as In(o_year, ...), a broadcast nation join, and
    the final (n_name) combine — no base fact is scanned at all (the
    query decoded a 600M-row join projection at sf100 before this)."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert L.layout_active(spark, SF)
    plan = _plan(QUERIES["q65_tpch_q5_local_volume"].builder(spark, SF))
    assert "rev_by_nation_year" in plan, plan
    # the year-aligned window reaches the MV scan as a pushed filter
    assert "In(o_year, [1996,1997])" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    # no base fact is rescanned: the MV replaces the whole join
    # (match on scan locations — "/orders]" can't false-positive against
    # the projection's ".../lineitem_orders]" path)
    assert "/lineitem]" not in plan and "/orders]" not in plan, plan
    assert "lineitem.parquet" not in plan and "orders.parquet" not in plan, plan
    assert "customer" not in plan and "supplier" not in plan, plan


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


def test_ddl_sorted_by_matches_files(spark, layout_dir):
    """VERDICT r05 item 5: the re-register DDL advertises SORTED BY only
    when the written files actually have per-bucket sortedness (one file
    per bucket — the repartition path). The big-source coalesce path and
    the projection's fan-out write must re-register WITHOUT it."""
    import unittest.mock as mock

    from highs_duckdb_spark.plans import strategy as S

    # force the big-source path on tiny data
    with mock.patch.object(S, "dir_bytes", lambda _p: 9 << 30):
        L.build_bucketed_layout(spark, SF, layout_dir, buckets=4)
    for table, _src, _b, _s in L._all_specs():
        spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(layout_dir, table)}")
    idents = L.register_bucketed_tables(spark, layout_dir, buckets=4)
    ddl = spark.sql(f"SHOW CREATE TABLE {idents['orders']}").first()[0]
    assert "CLUSTERED BY" in ddl and "SORTED BY" not in ddl, ddl
    # and the marker records why
    assert L._layout_marker(os.path.join(layout_dir, "orders"))["bucket_sorted"] is False


def test_ddl_sorted_by_present_on_repartition_path(spark, layout_dir):
    L.build_bucketed_layout(spark, SF, layout_dir, buckets=4)
    for table, _src, _b, _s in L._all_specs():
        spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(layout_dir, table)}")
    idents = L.register_bucketed_tables(spark, layout_dir, buckets=4)
    ddl = spark.sql(f"SHOW CREATE TABLE {idents['orders']}").first()[0]
    assert "SORTED BY" in ddl, ddl
    assert L._layout_marker(os.path.join(layout_dir, "orders"))["bucket_sorted"] is True
    # the projection never claims per-bucket sortedness (fan-out write)
    proj_path = os.path.join(layout_dir, "lineitem_orders")
    if os.path.isdir(proj_path):
        assert L._layout_marker(proj_path).get("bucket_sorted", False) is False


def test_q178_empty_intersection_scans_zero_files(spark, tmp_path):
    """VERDICT r05 item 4: when zone maps PROVE no file intersects the
    range, the aggregate must come from an empty LocalRelation — zero
    input files — never a full-scan fallback."""
    import unittest.mock as mock

    from highs_duckdb_spark.operators.relational import _price_range_aggregate

    d = str(tmp_path / "layout")
    L.build_banded_orders(spark, SF, d)
    with mock.patch.object(L, "default_layout_dir", lambda _s: d):
        df = _price_range_aggregate(spark, SF, 1e12, 2e12)  # beyond any price
    assert df.inputFiles() == []
    plan = _plan(df)
    assert "FileScan parquet" not in plan and ".parquet" not in plan, plan
    assert df.collect() == []
    # schema identical to the served aggregate
    assert df.columns == ["o_orderpriority", "n", "total"]


def test_primary_sidecar_harvest_and_cache(spark, tmp_path):
    """Footer sidecar for a READ-ONLY sf dir: harvested into the repo-local
    cache, served from it on re-read, and invalidated when the source
    fingerprint changes."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    cache = str(tmp_path / "sidecars")
    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: cache), \
         mock.patch.dict(zstats._SIDECAR_MEMO, clear=True):
        stats, base = zstats.primary_sidecar(SF, "orders")
        assert stats is not None and len(stats["files"]) == 1
        assert base == SF  # single-file table: base is the sf dir itself
        assert os.listdir(cache)  # persisted
        again, _ = zstats.primary_sidecar(SF, "orders")
        assert again == stats
        # missing table: no stats, never prunes
        none_stats, _ = zstats.primary_sidecar(str(tmp_path), "orders")
        assert none_stats is None


def _write_multifile_orders(spark, root) -> str:
    """A fake sf dir whose orders table is a DIRECTORY of 4 price-disjoint
    files (what gen_scale/production layouts produce)."""
    sf2 = os.path.join(str(root), "sfmulti")
    dest = os.path.join(sf2, "orders.parquet")
    os.makedirs(dest, exist_ok=True)
    orders = load_table(spark, "orders", SF)
    for i, (lo, hi) in enumerate([(0, 150e3), (150e3, 300e3), (300e3, 450e3), (450e3, 1e9)]):
        (
            orders.filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(dest)
        )
    return sf2


def test_pruned_scan_multifile_prunes_and_matches(spark, tmp_path):
    """On a multi-file table, pruned_scan must read strictly fewer files
    for a selective range and return exactly the full-scan filter rows."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    sf2 = _write_multifile_orders(spark, tmp_path)
    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")), \
         mock.patch.object(L, "PRUNE_MIN_FILES", 0):
        pruned = L.pruned_scan(spark, sf2, "orders", "o_totalprice", lo=300e3, hi=400e3)
        full = load_table(spark, "orders", sf2)
        assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
        cond = (F.col("o_totalprice") >= 300e3) & (F.col("o_totalprice") < 400e3)
        assert sorted(r["o_orderkey"] for r in pruned.filter(cond).collect()) == sorted(
            r["o_orderkey"] for r in full.filter(cond).collect()
        )
        # empty intersection: zero files
        empty = L.pruned_scan(spark, sf2, "orders", "o_totalprice", lo=1e12)
        assert empty.inputFiles() == [] and empty.count() == 0
        # unbounded range: nothing pruned → plain load_table path
        whole = L.pruned_scan(spark, sf2, "orders", "o_totalprice")
        assert len(whole.inputFiles()) == len(full.inputFiles())


def test_pruned_scan_strings(spark, tmp_path):
    """Round 6: STRING zone maps prune too — footer min/max are valid
    bounds by the parquet spec even when truncated, and range pruning only
    needs bound validity. Files split by o_orderpriority ranges, pruned on
    an equality (lo == hi) range."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    sf2 = os.path.join(str(tmp_path), "sfs")
    dest = os.path.join(sf2, "orders.parquet")
    os.makedirs(dest, exist_ok=True)
    orders = load_table(spark, "orders", SF)
    for cond in [
        F.col("o_orderpriority") < "3",
        (F.col("o_orderpriority") >= "3") & (F.col("o_orderpriority") < "4"),
        F.col("o_orderpriority") >= "4",
    ]:
        orders.filter(cond).coalesce(1).write.mode("append").parquet(dest)
    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")), \
         mock.patch.object(L, "PRUNE_MIN_FILES", 0):
        stats, base = zstats.primary_sidecar(sf2, "orders")
        assert any(
            "o_orderpriority" in f["columns"] for f in stats["files"]
        ), "string column missing from footer sidecar"
        pruned = L.pruned_scan(
            spark, sf2, "orders", "o_orderpriority", lo="3-MEDIUM", hi="3-MEDIUM"
        )
        full = load_table(spark, "orders", sf2)
        assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
        cond = F.col("o_orderpriority") == "3-MEDIUM"
        assert pruned.filter(cond).count() == full.filter(cond).count()


def test_range_selectivity_derived_from_zones(spark):
    """The derived ANALYZE stat JoinGraph's cost model consumes tracks
    ground truth closely on the graded data — temporal ranges via the
    sampled quantile histogram (zone interpolation as fallback), and
    since round 7's histograms STRING ranges too (zone interpolation was
    meaningless there; equi-depth quantiles order strings natively).
    Missing tables still degrade to the declared default."""
    import duckdb

    from highs_duckdb_spark.sources.layout import range_selectivity

    est = range_selectivity(SF, "orders", "o_orderdate", hi="1998-03-15", default=-1)
    con = duckdb.connect()
    true = con.execute(
        f"SELECT avg((o_orderdate < TIMESTAMP '1998-03-15')::INT) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert abs(est - true) < 0.05, (est, true)
    # string column: served by the histogram within bucket granularity
    s_est = range_selectivity(
        SF, "orders", "o_orderpriority", lo="1", hi="2", default=0.4
    )
    s_true = con.execute(
        "SELECT avg((o_orderpriority BETWEEN '1' AND '2')::INT) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert s_est != 0.4 and abs(s_est - s_true) < 0.07, (s_est, s_true)
    # missing table → default
    assert range_selectivity("/nonexistent", "orders", "o_orderdate", default=0.7) == 0.7


def test_files_for_range_incomparable_stats_never_prune_or_crash(spark):
    """tz-aware footer stats (TIMESTAMP isAdjustedToUTC=true) or DATE
    stats vs a naive datetime bound must degrade to KEEP (no pruning),
    never raise — 'absence of usable stats never prunes'."""
    import datetime as dt

    from highs_duckdb_spark.sources import stats as zstats

    aware = dt.datetime(1997, 1, 1, tzinfo=dt.timezone.utc)
    stats = {
        "files": [
            {"path": "a.parquet", "rows": 1,
             "columns": {"d": {"min": {"$ts": aware.isoformat()},
                                "max": {"$ts": aware.isoformat()}}}},
            {"path": "b.parquet", "rows": 1,
             "columns": {"d": {"min": {"$date": "1997-01-01"},
                                "max": {"$date": "1997-06-01"}}}},
        ]
    }
    kept = zstats.files_for_range(
        stats, "/x", "d", lo=dt.datetime(1998, 1, 1), hi=dt.datetime(1999, 1, 1)
    )
    assert len(kept) == 2  # incomparable: both kept, no TypeError
    # comparable naive stats still prune as before
    naive = {"files": [{"path": "c.parquet", "rows": 1,
                         "columns": {"d": {"min": {"$ts": "1995-01-01T00:00:00"},
                                            "max": {"$ts": "1995-06-01T00:00:00"}}}}]}
    assert zstats.files_for_range(naive, "/x", "d", lo=dt.datetime(1998, 1, 1)) == []


def test_pruned_scan_file_count_threshold(spark, tmp_path):
    """Below PRUNE_MIN_FILES the planner scans plain (pushdown already
    row-group-skips the data; a narrower reader only costs parallelism —
    measured at sf10), while a provably-EMPTY intersection still returns
    zero files at any count."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    sf2 = _write_multifile_orders(spark, tmp_path)
    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")):
        assert L.PRUNE_MIN_FILES > 4  # this table is below the threshold
        pruned = L.pruned_scan(spark, sf2, "orders", "o_totalprice", lo=300e3, hi=400e3)
        full = load_table(spark, "orders", sf2)
        assert len(pruned.inputFiles()) == len(full.inputFiles())  # plain path
        empty = L.pruned_scan(spark, sf2, "orders", "o_totalprice", lo=1e12)
        assert empty.inputFiles() == [] and empty.count() == 0


def test_pruned_scan_dates(spark, tmp_path):
    """files_for_range prunes on DATE/TIMESTAMP zones too (q64's
    o_orderdate route, VERDICT r05 item 3)."""
    import datetime as dt
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    sf2 = os.path.join(str(tmp_path), "sfd")
    dest = os.path.join(sf2, "orders.parquet")
    os.makedirs(dest, exist_ok=True)
    orders = load_table(spark, "orders", SF)
    for lo, hi in [("1995-01-01", "1997-01-01"), ("1997-01-01", "1999-01-01")]:
        (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(dest)
        )
    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")), \
         mock.patch.object(L, "PRUNE_MIN_FILES", 0):
        pruned = L.pruned_scan(
            spark, sf2, "orders", "o_orderdate", hi=dt.datetime(1996, 6, 1)
        )
        full = load_table(spark, "orders", sf2)
        assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
        cond = F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp")
        assert pruned.filter(cond).count() == full.filter(cond).count()


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


def test_estimator_date_stats_vs_datetime_bound(spark):
    """DATE-typed zones vs datetime bounds must interpolate on ONE numeric
    scale (epoch seconds), not _cmp_key's mixed toordinal/epoch scales
    that fabricated selectivity 1.0/0.0 (round-6 review repro)."""
    import datetime as dt

    from highs_duckdb_spark.sources import stats as zstats

    stats = {"files": [{"path": "a.parquet", "rows": 100, "row_groups": [
        {"rows": 100, "columns": {"d": {"min": {"$date": "1995-01-01"},
                                         "max": {"$date": "1999-01-01"}}}}]}]}
    est = zstats.estimate_range_selectivity(
        stats, "d", hi=dt.datetime(1997, 1, 1)
    )
    assert est is not None and 0.3 < est < 0.7, est  # ~half the span
    lo_est = zstats.estimate_range_selectivity(
        stats, "d", lo=dt.datetime(1998, 1, 1)
    )
    assert lo_est is not None and 0.1 < lo_est < 0.4, lo_est


# --- round 7: ns-timestamp zone maps, sidecar versioning, NDV selectivities --


def _write_ns_clustered(tmp_path):
    """Three parquet files of a timestamp[ns] column, time-clustered and
    DISJOINT by file, with file 0's true max at .999999999 ns — the case
    where a µs-truncated (pre-round-7) max would prune UNSOUNDLY."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00
    day = 86_400_000_000_000
    dest = tmp_path / "events_ns"
    dest.mkdir()
    for i in range(3):
        vals = np.arange(100, dtype=np.int64) * (day // 200) + base_ns + i * day
        if i == 0:
            vals[-1] = base_ns + day - 1  # ...T23:59:59.999999999
        arr = pa.array(vals, type=pa.timestamp("ns"))
        pq.write_table(
            pa.table({"ts": arr, "n": pa.array(range(100), pa.int64())}),
            str(dest / f"part-{i}.parquet"),
        )
    return str(dest)


def test_ns_timestamp_zone_maps_prune_soundly(tmp_path):
    """VERDICT r06 item 3 'done' bar: a time-clustered ns-timestamp corpus
    prunes files on a timestamp predicate with identical qualifying rows,
    and the µs-WIDENED max keeps the .999999999 row reachable (the exact
    row a truncated bound would lose)."""
    import datetime as dt

    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import stats as zstats

    dest = _write_ns_clustered(tmp_path)
    stats = zstats.write_sidecar(dest)
    ts_stats = [f["columns"].get("ts") for f in stats["files"]]
    assert all(ts_stats), "ns-timestamp column missing from sidecar"
    # a mid-day-2 window prunes to one file: file 0's WIDENED max is
    # exactly 2024-01-02T00:00:00 (ceil of ...T23:59:59.999999999), which
    # is provably < 01:00, so file 0 drops; file 2 starts day 3
    lo, hi = dt.datetime(2024, 1, 2, 1), dt.datetime(2024, 1, 2, 23)
    keep = zstats.files_for_range(stats, dest, "ts", lo=lo, hi=hi)
    assert len(keep) == 1 and keep[0].endswith("part-1.parquet")
    # soundness at the widened boundary: the last ns of day 1 lives in
    # file 0 and its ceiled max TOUCHES midnight — a window starting at
    # midnight must keep file 0 (a truncated max would have dropped it,
    # losing the .999999999 row from any scan that reads ns precision)
    keep = zstats.files_for_range(stats, dest, "ts", lo=dt.datetime(2024, 1, 2))
    names = {os.path.basename(k) for k in keep}
    assert "part-0.parquet" in names, names
    # identical qualifying rows: every row in the window is in kept files
    keep_day2 = zstats.files_for_range(stats, dest, "ts", lo=lo, hi=hi)
    import pyarrow.dataset as ds

    import pyarrow.compute as pc

    def rows_in(files):
        n = 0
        for f in files:
            t = pq.read_table(f)
            mask = pc.and_(
                pc.greater_equal(t["ts"], pa_scalar(lo)),
                pc.less_equal(t["ts"], pa_scalar(hi)),
            )
            n += pc.sum(pc.cast(mask, "int64")).as_py() or 0
        return n

    import pyarrow as pa

    def pa_scalar(v):
        return pa.scalar(v, type=pa.timestamp("ns"))

    all_files = [os.path.join(dest, f["path"]) for f in stats["files"]]
    assert rows_in(keep_day2) == rows_in(all_files) > 0


def test_pruned_scan_events_ns_timestamps_end_to_end(spark, tmp_path):
    """q180's path: pruned_scan over a time-clustered NANOSECOND-timestamp
    events table reads strictly fewer files and returns exactly the plain
    scan's qualifying rows — the pruned reader must re-apply load_table's
    ns→µs normalization (a borrowed post-normalization schema would
    misread the raw long-nanos files)."""
    import unittest.mock as mock

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import stats as zstats

    sf2 = os.path.join(str(tmp_path), "sfe")
    dest = os.path.join(sf2, "events.parquet")
    os.makedirs(dest, exist_ok=True)
    base_ns = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00
    day = 86_400_000_000_000
    for i in range(4):  # four disjoint day files
        vals = np.arange(200, dtype=np.int64) * (day // 400) + base_ns + i * day
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array(vals, type=pa.timestamp("ns")),
                    "event_type": pa.array(["click", "view"] * 100),
                    "user_id": pa.array(np.arange(200, dtype=np.int64) % 7),
                }
            ),
            os.path.join(dest, f"part-{i}.parquet"),
        )
    with mock.patch.object(
        zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")
    ), mock.patch.object(L, "PRUNE_MIN_FILES", 0):
        pruned = L.pruned_scan_dates(
            spark, sf2, "events", "ts", lo="2024-01-02", hi="2024-01-03"
        )
        full = load_table(spark, "events", sf2)
        assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
        assert str(pruned.schema["ts"].dataType) == str(full.schema["ts"].dataType)
        cond = (F.col("ts") >= F.lit("2024-01-02").cast("timestamp")) & (
            F.col("ts") < F.lit("2024-01-03").cast("timestamp")
        )
        assert sorted(
            (r["ts"], r["user_id"]) for r in pruned.filter(cond).collect()
        ) == sorted((r["ts"], r["user_id"]) for r in full.filter(cond).collect())
        # the registered query itself runs on the pruned corpus
        from highs_duckdb_spark.operators import QUERIES

        rows = QUERIES["q180_time_range_pruned"].builder(spark, sf2).collect()
        assert rows == [] or all(r["n"] >= r["users"] for r in rows)


def test_read_sidecar_version_mismatch_reharvests(tmp_path):
    """ADVICE r06 (medium): a sidecar with a stale payload version must be
    re-harvested in place, never trusted — and when the dir is read-only,
    the answer is None (absence never prunes)."""
    import json

    from highs_duckdb_spark.sources import stats as zstats

    dest = _write_ns_clustered(tmp_path)
    fresh = zstats.write_sidecar(dest)
    assert fresh["version"] == zstats.STATS_VERSION
    # forge a pre-round-7 sidecar: version 1, truncated (unsound) bounds
    with open(os.path.join(dest, zstats.SIDECAR), "w") as f:
        json.dump({"version": 1, "files": [{"path": "bogus", "rows": 0}]}, f)
    back = zstats.read_sidecar(dest)
    assert back is not None and back["version"] == zstats.STATS_VERSION
    assert all(f["path"] != "bogus" for f in back["files"])
    # unwritable destination (read-only mount): re-harvest can't persist →
    # no stats served (chmod can't model this under root, so patch the
    # write to raise what a read-only fs would)
    import unittest.mock as mock

    with open(os.path.join(dest, zstats.SIDECAR), "w") as f:
        json.dump({"version": 1, "files": []}, f)
    with mock.patch.object(zstats, "write_sidecar", side_effect=OSError("read-only")):
        assert zstats.read_sidecar(dest) is None


def test_bucket_sorted_detects_multifile_bucket(tmp_path):
    """ADVICE r06: pre-marker layouts are judged per BUCKET ID (parsed
    from Spark's file names), not by total file count — two files in one
    bucket means the DDL must not claim SORTED BY even when total files ≤
    buckets."""
    d = tmp_path / "bucketed"
    d.mkdir()
    # bucket 0 has TWO files; buckets 1..2 empty; total 3 files < 4 buckets
    for name in [
        "part-00000-aaaa_00000.c000.snappy.parquet",
        "part-00001-bbbb_00000.c000.snappy.parquet",
        "part-00002-cccc_00001.c000.snappy.parquet",
    ]:
        (d / name).write_bytes(b"x")  # content never read: names are parsed
    assert L._bucket_sorted(str(d), buckets=4) is False
    # one file per bucket id: sorted claim stands
    d2 = tmp_path / "bucketed_ok"
    d2.mkdir()
    for b in range(3):
        (d2 / f"part-0000{b}-aaaa_0000{b}.c000.snappy.parquet").write_bytes(b"x")
    assert L._bucket_sorted(str(d2), buckets=4) is True
    # unparseable names: conservative count rule
    d3 = tmp_path / "plainfiles"
    d3.mkdir()
    for b in range(5):
        (d3 / f"chunk{b}.parquet").write_bytes(b"x")
    assert L._bucket_sorted(str(d3), buckets=4) is False


def test_eq_and_semijoin_selectivity_derived(tmp_path, monkeypatch):
    """eq_selectivity = 1/NDV from the footer sidecar's sample-NDV
    statistic; semijoin_key_selectivity = 1-(1-s)^fanout; both honour the
    kill switch and fall back without stats."""
    import unittest.mock as mock

    from highs_duckdb_spark.sources import stats as zstats

    with mock.patch.object(zstats, "primary_sidecar_cache", lambda: str(tmp_path / "sc")):
        zstats._SIDECAR_MEMO.clear()
        # c_mktsegment has 5 segments in the TPC-H-ish data
        s = L.eq_selectivity(SF, "customer", "c_mktsegment", default=-1.0)
        assert s == pytest.approx(0.2, abs=0.05)
        # IN-list of 2 values doubles it
        s2 = L.eq_selectivity(SF, "customer", "c_mktsegment", nvalues=2, default=-1.0)
        assert s2 == pytest.approx(2 * s)
        # no harvest for the column → declared default
        assert L.eq_selectivity(SF, "customer", "no_such_col", default=0.7) == 0.7
        # semi-join key fraction: bounded by [row_sel, 1], monotone in s
        lo = L.semijoin_key_selectivity(SF, "lineitem", "l_orderkey", 0.1, default=-1.0)
        hi = L.semijoin_key_selectivity(SF, "lineitem", "l_orderkey", 0.5, default=-1.0)
        assert 0.1 <= lo <= hi <= 1.0
        assert L.semijoin_key_selectivity(SF, "lineitem", "l_orderkey", 0.0, default=-1.0) == 0.0
        monkeypatch.setenv("HDS_DISABLE_PRUNING", "1")
        assert L.eq_selectivity(SF, "customer", "c_mktsegment", default=0.3) == 0.3
        assert L.semijoin_key_selectivity(SF, "lineitem", "l_orderkey", 0.2, default=0.4) == 0.4
    zstats._SIDECAR_MEMO.clear()


def test_histogram_selectivity_robust_to_skew(tmp_path):
    """The estimator property zone maps CANNOT provide: on a heavy-hitter
    column (99% one value), uniform interpolation over [min, max]
    fabricates ~0.5 for a top-half range that truly holds ~0.5% of rows;
    the sampled equi-depth quantiles see the mass. Both paths live in
    estimate_range_selectivity — stripping the ndv section pins the
    fallback's (documented) failure mode so a regression in either path
    is visible."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import stats as z

    vals = [1] * 99_000 + list(range(2, 1002))
    pq.write_table(
        pa.table({"x": pa.array(vals, pa.int64())}),
        str(tmp_path / "t.parquet"),
    )
    stats = z.collect_stats(str(tmp_path))
    stats["ndv"] = z.collect_ndv(str(tmp_path))
    truth = 502 / 100_000
    est = z.estimate_range_selectivity(stats, "x", lo=500)
    # histogram: within bucket granularity (1/32) of the truth
    assert est is not None and abs(est - truth) < 1.5 / z.HIST_BUCKETS, est
    # heavy hitter itself: ~0.99, again within granularity
    est_hh = z.estimate_range_selectivity(stats, "x", hi=1)
    assert est_hh is not None and abs(est_hh - 0.99) < 1.5 / z.HIST_BUCKETS
    # zone fallback (no ndv section): fabricates ~half — the skew blind
    # spot the histogram exists to fix
    zones_only = {k: v for k, v in stats.items() if k != "ndv"}
    zone_est = z.estimate_range_selectivity(zones_only, "x", lo=500)
    assert zone_est is not None and zone_est > 0.3, zone_est


def test_ndv_harvest_bounds_file_fanout(tmp_path, monkeypatch):
    """The sampling floor must not make the harvest O(files): past
    budget/floor files, an evenly-spaced file subset is read at floor
    depth while TRUE total rows still come from every footer — the GEE
    scale factor and the row count stay honest (100-TB tables hold
    10k-100k part files; reading 65k values from each is a scan, not a
    sample)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import stats as z

    monkeypatch.setattr(z, "NDV_VALUE_BUDGET", 65536 * 4)  # max 4 files
    d = tmp_path / "t"
    d.mkdir()
    n_files, rows_per = 12, 1000
    for i in range(n_files):
        pq.write_table(
            pa.table({"k": pa.array(
                [i * rows_per + j for j in range(rows_per)], pa.int64()
            )}),
            str(d / f"part-{i:03d}.parquet"),
        )
    out = z.collect_ndv(str(d))
    assert out["rows"] == n_files * rows_per  # every footer counted
    assert out["sample_rows"] == 4 * rows_per  # only the subset read
    # unique key sampled from spread files: estimate within GEE bounds
    ndv = out["columns"]["k"]["ndv"]
    assert 4 * rows_per <= ndv <= n_files * rows_per
    # quantiles span the spread subset (not one file's prefix)
    q = out["columns"]["k"]["q"]
    assert q[0] < rows_per and q[-1] >= (n_files - 3) * rows_per


def test_hist_frac_cross_type_returns_none():
    """String-boundary histograms probed with an incomparable value must
    decline (None), via an explicit TypeError probe — the old
    `not (keys[0] <= nv or nv <= keys[-1])` condition can never be True
    under any total order and only worked as a TypeError trigger
    (ADVICE r07: dead branch removed, intent made explicit)."""
    from highs_duckdb_spark.sources import stats as z

    bounds = ["a", "b", "c", "d", "e"]
    assert z._hist_frac(bounds, 3, below=True) is None  # int vs str
    assert z._hist_frac(bounds, 3, below=False) is None
    est = z._hist_frac(bounds, "c", below=True)
    assert est is not None and 0.0 < est < 1.0


def test_zone_fallback_scales_by_nonnull_fraction():
    """The histogram path scales range selectivity by the sampled
    non-null fraction; the zone-map fallback must apply the SAME factor
    when the harvest recorded one, so the two estimators agree on
    nullable columns (ADVICE r07)."""
    import pytest as _pytest

    from highs_duckdb_spark.sources import stats as z

    stats = {
        "files": [
            {
                "path": "f.parquet",
                "rows": 100,
                "columns": {},
                "row_groups": [
                    {"rows": 100, "columns": {"x": {"min": 0, "max": 100}}}
                ],
            }
        ],
        # nn recorded but no quantiles ("q"): the zone fallback runs
        "ndv": {"columns": {"x": {"ndv": 50.0, "nn": 0.5}}},
    }
    est = z.estimate_range_selectivity(stats, "x", lo=0, hi=100)
    assert est == _pytest.approx(0.5)
    # without any harvest the fallback keeps its documented upper bias
    zones_only = {k: v for k, v in stats.items() if k != "ndv"}
    assert z.estimate_range_selectivity(zones_only, "x", lo=0, hi=100) == _pytest.approx(1.0)


def test_topk_scan_threshold_is_exact(spark):
    """q42's primary-sidecar threshold push (VERDICT r07 item 2): the
    pushed `col >= t` scan must contain the full top-k at any clustering
    (topk_plan's row-count guarantee), so the filtered top-k equals the
    full-scan top-k exactly; without stats (kill switch) the scan is the
    plain table and t is None."""
    from highs_duckdb_spark.sources.layout import topk_scan

    df, t = topk_scan(spark, SF, "orders", "o_totalprice", 25)
    full = load_table(spark, "orders", SF)
    if t is not None:
        kept = df.filter(F.col("o_totalprice") >= F.lit(t))
        top_kept = kept.orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        ).limit(25).collect()
        top_full = full.orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        ).limit(25).collect()
        assert top_kept == top_full
        # the guarantee: at least k rows clear the threshold
        assert kept.count() >= 25
    import os as _os

    _os.environ["HDS_DISABLE_PRUNING"] = "1"
    try:
        df2, t2 = topk_scan(spark, SF, "orders", "o_totalprice", 25)
    finally:
        del _os.environ["HDS_DISABLE_PRUNING"]
    assert t2 is None


def test_topk_scan_threshold_correct_on_layout_copy(spark, layout_dir):
    """The threshold is a pure row predicate — correct on ANY same-rows
    copy, including the attached bucketed layout's (no file narrowing
    there, just the pushed predicate)."""
    from highs_duckdb_spark.operators import QUERIES

    plain = [tuple(r) for r in QUERIES["q42_topk"].builder(spark, SF).collect()]
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    bucketed = [tuple(r) for r in QUERIES["q42_topk"].builder(spark, SF).collect()]
    assert plain == bucketed


def test_like_prefix_selectivity_histogram_and_skew(tmp_path):
    """LIKE-prefix selectivity from the string quantile histogram
    (VERDICT r07 item 3): on a heavy-hitter prefix (99% of rows) the
    histogram reads the real mass where the equality-class guess (1/NDV ≈
    0.001 here) is off by three orders of magnitude; a rare prefix reads
    small. Histogram-granularity (half-bucket) accuracy is the contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import layout as LL

    vals = ["HEAVY#" + str(i % 7) for i in range(99_000)] + [
        "rare#" + str(i) for i in range(1_000)
    ]
    pq.write_table(pa.table({"s": pa.array(vals)}), str(tmp_path / "tbl.parquet"))
    heavy = LL.like_prefix_selectivity(str(tmp_path), "tbl", "s", "HEAVY#", default=-1.0)
    rare = LL.like_prefix_selectivity(str(tmp_path), "tbl", "s", "rare#", default=-1.0)
    assert abs(heavy - 0.99) < 0.05, heavy
    assert 0.0 <= rare < 0.05, rare
    # unknown column → declared default; empty prefix → matches everything
    assert LL.like_prefix_selectivity(str(tmp_path), "tbl", "nope", "x", default=0.3) == 0.3
    assert LL.like_prefix_selectivity(str(tmp_path), "tbl", "s", "", default=0.3) == 1.0


def test_like_prefix_selectivity_on_graded_data(monkeypatch):
    """Real-column accuracy at the graded SF: the six p_type first words
    split the domain ~uniformly, so LIKE 'PROMO%' must read ~1/6 (the old
    negated-equality call site guessed 1−1/NDV ≈ 0.99 for q95's NOT
    LIKE); the kill switch falls back to the declared default."""
    from highs_duckdb_spark.sources import layout as LL

    s = LL.like_prefix_selectivity(SF, "part", "p_type", "PROMO", default=-1.0)
    assert 0.08 <= s <= 0.25, s
    monkeypatch.setenv("HDS_DISABLE_PRUNING", "1")
    assert LL.like_prefix_selectivity(SF, "part", "p_type", "PROMO", default=0.4) == 0.4


def test_agg_mv_incremental_refresh_equals_rebuild(spark, tmp_path):
    """Round 8: refresh_agg_mv maintains a built MV after an FK-pattern
    append by aggregating ONLY the delta's contribution and merging
    partials — byte-identical rows to a full rebuild over the post-append
    sources (the 100-TB maintenance path: per-batch pass, not a
    600M-row re-join per refresh)."""
    import shutil as _shutil

    src = tmp_path / "sf"
    src.mkdir()
    # base = every table, with the last 20% of lineitem held out as the
    # append batch (orders/customers/suppliers all pre-exist: the
    # children-last FK append pattern)
    for t in ("orders", "customer", "supplier", "nation"):
        _shutil.copy(f"{SF}/{t}.parquet", src / f"{t}.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    cut = int(n * 0.8)
    base = li.limit(cut).localCheckpoint(eager=True)
    delta = li.subtract(base).localCheckpoint(eager=True)
    assert base.count() + delta.count() == n  # no duplicate rows in SF data
    lidir = str(src / "lineitem.parquet")
    base.coalesce(1).write.parquet(lidir)

    from highs_duckdb_spark.sources import layout as LL

    layout_dir = str(tmp_path / "layout")
    name = "rev_by_nation_year"
    LL._build_agg_mvs(spark, str(src), layout_dir, idents={})
    # the append lands in the live table dir, then the MV refreshes from
    # the delta alone
    delta.coalesce(1).write.mode("append").parquet(lidir)
    from highs_duckdb_spark.session import _READER_CACHE

    _READER_CACHE.clear()  # the table's file set changed
    path = LL.refresh_agg_mv(spark, str(src), name, {"lineitem": delta}, layout_dir)
    refreshed = sorted(map(tuple, spark.read.parquet(path).collect()))
    refreshed_schema = spark.read.parquet(path).schema

    # ground truth: full rebuild over the post-append sources
    _shutil.rmtree(path)
    LL._build_agg_mvs(spark, str(src), layout_dir, idents={})
    rebuilt = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert refreshed == rebuilt
    assert refreshed_schema == spark.read.parquet(path).schema
    # and the refresh re-stamped a fingerprint current for the appended
    # sources (a third build call is a no-op — idempotence restored)
    assert LL._fingerprint_current(
        path,
        "".join(
            LL._source_fingerprint(str(src), t)
            for t in LL.AGG_MV_SPECS[name]["tables"]
        )
        + __import__("hashlib").md5(
            __import__("json").dumps(
                LL._agg_mv_fingerprint_payload(LL.AGG_MV_SPECS[name]),
                sort_keys=True,
            ).encode()
        ).hexdigest(),
    )


# --- round 10: co-clustered dim demotion (VERDICT r09 item 1) --------------


def test_q10_cocluster_demotes_to_bucket_aligned_shj(spark, layout_dir, monkeypatch):
    """With the layout attached and the build-size gate forced low, q10 demotes
    part from broadcast to a bucket-aligned shuffled-hash join over the
    partkey-clustered copies of BOTH tables: no BroadcastHashJoin, no
    exchange on either side, result-identical to the broadcast plan."""
    from highs_duckdb_spark.plans import cbo

    plain = {
        tuple(r)
        for r in QUERIES["q10_join_broadcast"].builder(spark, SF).collect()
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    monkeypatch.setattr(cbo, "COCLUSTER_MIN_BUILD_BYTES", 1)
    df = QUERIES["q10_join_broadcast"].builder(spark, SF)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # both scans ride the partkey-clustered copies, bucket-aligned: the
    # ONLY exchange left is the final groupBy(p_brand) aggregation's
    assert "lineitem__by_partkey" in plan, plan
    assert "part__by_partkey" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert {tuple(r) for r in df.collect()} == plain


def test_q10_cocluster_declines_small_build_map(spark, layout_dir):
    """At test scale the filtered part build map is kilobytes — far below
    the measured demotion boundary — so the gate must keep broadcast's
    simpler shape even with the layout (and both clustered copies)
    attached."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    plan = _plan(QUERIES["q10_join_broadcast"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_cocluster_disable_env_restores_broadcast(spark, layout_dir, monkeypatch):
    """HDS_DISABLE_COCLUSTER=1 (the A/B baseline arm) forces the broadcast
    plan even when the gate would fire."""
    from highs_duckdb_spark.plans import cbo

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    monkeypatch.setattr(cbo, "COCLUSTER_MIN_BUILD_BYTES", 1)
    monkeypatch.setenv("HDS_DISABLE_COCLUSTER", "1")
    plan = _plan(QUERIES["q10_join_broadcast"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_cocluster_gate_explain_records_decision(spark, layout_dir, monkeypatch):
    """The PlanExplain record carries the demotion (or its machine-readable
    decline) so the decision is auditable like every other CBO choice."""
    import pyspark.sql.functions as F2

    from highs_duckdb_spark.plans import cbo
    from highs_duckdb_spark.sources.layout import eq_selectivity

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)

    def graph():
        g = cbo.JoinGraph(spark, SF)
        g.fact("lineitem", load_table(spark, "lineitem", SF), catalog_rows=True)
        g.dim(
            "part",
            load_table(spark, "part", SF),
            after=("lineitem",),
            on=("l_partkey", "p_partkey"),
            prepare=lambda df: df.filter(F2.col("p_type") == "ECONOMY"),
            key="p_partkey",
            sel=eq_selectivity(SF, "part", "p_type", default=0.2),
        )
        return g

    g = graph()
    g.plan()
    assert g.explain.cocluster == ()
    assert any(
        name == "part" and reason.startswith("below_min_build:")
        for name, reason in g.explain.cocluster_declines
    ), g.explain.cocluster_declines

    monkeypatch.setattr(cbo, "COCLUSTER_MIN_BUILD_BYTES", 1)
    g = graph()
    g.plan()
    assert g.explain.cocluster == ("part",)
    assert g.explain.dim_alt_copies == ("part",)
    assert ("lineitem", "l_partkey") in g.explain.alt_copies


def test_value_clustered_guards_non_numeric_and_empty(spark, tmp_path):
    """ADVICE r09: build_value_clustered must fail with a clear error on
    string columns and empty tables instead of a TypeError deep in the
    band arithmetic."""
    with pytest.raises(ValueError, match="unsupported column type"):
        L.build_value_clustered(
            spark, SF, "part", "p_type", layout_dir=str(tmp_path / "a")
        )
    empty_sf = tmp_path / "sf_empty"
    empty_sf.mkdir()
    load_table(spark, "part", SF).limit(0).write.parquet(
        str(empty_sf / "part.parquet")
    )
    with pytest.raises(ValueError, match="empty"):
        L.build_value_clustered(
            spark, str(empty_sf), "part", "p_retailprice",
            layout_dir=str(tmp_path / "b"),
        )


def test_agg_mv_refresh_cost_is_delta_bound_never_rescans_fact(spark, tmp_path):
    """Round 10 (VERDICT r09 item 7's regression pin): the refresh's COST
    contract is that it reads the delta + live parents + stored partials,
    NEVER the accumulated base fact. Pin it structurally: delete the base
    lineitem files after the MV is built — a refresh that re-joined the
    fact history would fail on missing files; the delta-bound refresh
    cannot notice and must still produce the exact rebuild-equivalent."""
    import shutil as _shutil

    src = tmp_path / "sf"
    src.mkdir()
    for t in ("orders", "customer", "supplier", "nation"):
        _shutil.copy(f"{SF}/{t}.parquet", src / f"{t}.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    base = li.limit(int(n * 0.8)).localCheckpoint(eager=True)
    delta = li.subtract(base).localCheckpoint(eager=True)
    lidir = str(src / "lineitem.parquet")
    base.coalesce(1).write.parquet(lidir)

    from highs_duckdb_spark.sources import layout as LL

    layout_dir = str(tmp_path / "layout")
    name = "rev_by_nation_year"
    LL._build_agg_mvs(spark, str(src), layout_dir, idents={})

    # ground truth FIRST (needs the fact): full rebuild over base+delta
    truth_dir = str(tmp_path / "truth_layout")
    delta.coalesce(1).write.mode("append").parquet(lidir)
    from highs_duckdb_spark.session import _READER_CACHE

    _READER_CACHE.clear()
    LL._build_agg_mvs(spark, str(src), truth_dir, idents={})
    truth = sorted(
        map(tuple, spark.read.parquet(os.path.join(truth_dir, name)).collect())
    )

    # now DELETE the base fact entirely and refresh from the delta alone
    _shutil.rmtree(lidir)
    _READER_CACHE.clear()
    path = LL.refresh_agg_mv(spark, str(src), name, {"lineitem": delta}, layout_dir)
    refreshed = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert refreshed == truth


def test_cocluster_gate_validates_copy_keys(spark, layout_dir, monkeypatch):
    """ADVICE r10: the cocluster gate must VERIFY, not trust, the copy
    wiring — (a) a dim whose alt copy is not clustered on the join's
    dim-side column declines with 'alt_copy_not_on_dim_key' instead of
    recording a bogus exchange-free demotion; (b) fact-copy matching is
    restricted to on[0], the fact-side key, so a dim-side column name that
    happens to match a fact copy can't demote."""
    import pyspark.sql.functions as F2

    from highs_duckdb_spark.plans import cbo
    from highs_duckdb_spark.sources.layout import _ALT_COPIES

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    monkeypatch.setattr(cbo, "COCLUSTER_MIN_BUILD_BYTES", 1)
    app = spark.sparkContext.applicationId

    # (a) corrupt the catalog record: claim part's copy is bucketed on a
    # column that is NOT the join's dim-side key — the gate must decline
    ident = _ALT_COPIES[(app, SF, "part")].pop(frozenset({"p_partkey"}))
    _ALT_COPIES[(app, SF, "part")][frozenset({"p_brand"})] = ident
    try:
        g = cbo.JoinGraph(spark, SF)
        g.fact("lineitem", load_table(spark, "lineitem", SF), catalog_rows=True)
        g.dim(
            "part",
            load_table(spark, "part", SF),
            after=("lineitem",),
            on=("l_partkey", "p_partkey"),
            prepare=lambda df: df.filter(F2.col("p_type") == "ECONOMY"),
            key="p_brand",  # mis-declared: matches the (corrupted) copy
            sel=0.2,
        )
        g.plan()
        assert g.explain.cocluster == ()
        assert ("part", "alt_copy_not_on_dim_key") in g.explain.cocluster_declines
    finally:
        _ALT_COPIES[(app, SF, "part")].pop(frozenset({"p_brand"}), None)
        _ALT_COPIES[(app, SF, "part")][frozenset({"p_partkey"})] = ident

    # (b) on[0] not covered by any fact copy → no_fact_copy, even though
    # the dim-side name (on[1]) IS a key some fact copy is clustered on
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF), catalog_rows=True)
    g.dim(
        "part",
        load_table(spark, "part", SF),
        # l_suppkey: a real lineitem column no copy clusters on
        cond=None,
        after=("lineitem",),
        on=("l_suppkey", "p_partkey"),
        prepare=lambda df: df.filter(F2.col("p_type") == "ECONOMY"),
        key="p_partkey",
        sel=0.2,
    )
    g.plan()
    assert g.explain.cocluster == ()
    assert ("part", "no_fact_copy") in g.explain.cocluster_declines


# --- round 11: FD-widened bucket-aligned aggregation -----------------------


def test_q64_fd_widening_elides_agg_exchange(spark, layout_dir):
    """With the custkey-clustered lineitem_orders projection serving q64,
    the declared FD (l_orderkey -> o_custkey) widens the physical
    grouping so the final aggregate's exchange is ELIDED — zero
    hashpartitioning exchanges in the whole plan — and the result is
    row-identical to the TRULY unwidened form (baseline collected with
    the widening forced off, so a false FD that split groups could not
    corrupt both arms identically — review r11)."""
    from highs_duckdb_spark.plans import cbo

    orig_widen = cbo.JoinGraph._fd_widen

    def _no_widen(self, tree):
        self._fd_widened = ()
        return []

    cbo.JoinGraph._fd_widen = _no_widen
    try:
        plain = {
            tuple(r)
            for r in QUERIES["q64_tpch_q3_shipping_priority"]
            .builder(spark, SF)
            .collect()
        }
    finally:
        cbo.JoinGraph._fd_widen = orig_widen
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    df = QUERIES["q64_tpch_q3_shipping_priority"].builder(spark, SF)
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan, plan
    assert {tuple(r) for r in df.collect()} == plain
    # output schema unchanged (the widening is projected away)
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]


def test_aggregate_fd_validation_and_decline(spark):
    """fd determinants must be group keys; an FD whose column is absent
    from the carrier declines with a machine-readable reason instead of
    failing the plan."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.plans.cbo import JoinGraph

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    g = JoinGraph(spark, SF)
    with pytest.raises(ValueError, match="not a group key"):
        g.aggregate(("o_orderpriority",), {"n": ("count", "*")}, fd={"o_custkey": "x"})
    g2 = JoinGraph(spark, SF)
    g2.fact("orders", orders)
    g2.fact("customer", cust)
    g2.edge("orders", "o_custkey", "customer", "c_custkey")
    # o_orderkey is NOT carried to the aggregate (not a grouped/agg col),
    # so the declared FD's column is absent from the carrier -> decline
    g2.aggregate(
        ("o_orderpriority",),
        {"n": ("count", "*")},
        fd={"o_orderpriority": "no_such_column"},
    )
    out = g2.plan()
    assert out.columns == ["o_orderpriority", "n"]
    assert g2.explain.fd_widened == ()
    assert g2.explain.fd_declines == (
        ("o_orderpriority->no_such_column", "column_not_on_carrier"),
    )
    out.collect()  # plans and runs
