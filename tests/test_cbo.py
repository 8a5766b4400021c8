"""CBO-lite planner (plans/cbo.py): cost model, layout-driven join-order
flips, dim broadcast/demotion, and cluster_by's bucketing no-op.

The planner replaced round-4's hand-coded ``if layout_active(...)`` branch
in q65 (VERDICT r04 item 1): these tests pin that the generic cost model
derives the SAME plan shapes from catalog metadata."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from highs_duckdb_spark.plans import cbo
from highs_duckdb_spark.session import clear_table_overrides, load_table
from highs_duckdb_spark.sources import layout as L

SF = "/root/testdata/sf0.001"


@pytest.fixture
def layout_dir(spark):
    d = tempfile.mkdtemp(prefix="hds_cbo_test_")
    try:
        yield d
    finally:
        clear_table_overrides(spark)
        for table, _src, _b, _s in L._all_specs():
            spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(d, table)}")
        for name in L.JOIN_PROJECTION_SPECS:
            spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(d, name)}")
        shutil.rmtree(d, ignore_errors=True)


def _graph_q65(spark):
    """The q65 fact graph (orders filtered ~0.30) without dims."""
    orders = load_table(spark, "orders", SF).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", orders, sel=0.30)
    g.fact("customer", load_table(spark, "customer", SF))
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    return g


def test_cost_model_prefers_small_tree_shuffles(spark):
    """Without a layout the planner must never pick a lineitem-first order:
    lineitem is the largest relation and a lineitem-first left-deep tree
    shuffles it twice (once to orderkey, its join output again to
    custkey)."""
    g = _graph_q65(spark)
    g.plan()
    assert g.explain.order[0] != "lineitem", g.explain
    # the simulated costs agree: lineitem-first is strictly worse
    li_first = g._simulate(("lineitem", "orders", "customer"))
    best = g._simulate(g.explain.order)
    assert li_first is not None and best is not None and best < li_first


def test_disconnected_prefixes_never_considered(spark):
    """(lineitem, customer, ...) has no edge — simulate returns None and
    plan() never builds a cartesian prefix."""
    g = _graph_q65(spark)
    assert g._simulate(("lineitem", "customer", "orders")) is None
    g.plan()
    order = g.explain.order
    # every prefix of the chosen order is connected
    for i in range(1, len(order)):
        assert g._edge_between(set(order[:i]), order[i]) is not None


def test_layout_flips_join_order_to_bucket_aligned(spark, layout_dir):
    """With lineitem/orders bucketed on orderkey and customer on custkey,
    the cost model must choose orders-first (two orders-sized shuffles,
    customer and lineitem exchange-free) — the flip round 4 hand-coded."""
    no_layout = _graph_q65(spark)
    no_layout.plan()
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65(spark)
    g.plan()
    assert g.explain.order == ("orders", "customer", "lineitem"), g.explain
    # bucketed sides priced as free: layout plan strictly cheaper
    assert g.explain.shuffled_bytes < no_layout.explain.shuffled_bytes


def test_storage_part_keys_reflect_attached_layout(spark, layout_dir):
    assert cbo.storage_part_keys(spark, SF, "lineitem") == frozenset()
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert cbo.storage_part_keys(spark, SF, "lineitem") == frozenset({"l_orderkey"})
    assert cbo.storage_part_keys(spark, SF, "customer") == frozenset({"c_custkey"})
    assert cbo.storage_part_keys(spark, SF, "nation") == frozenset()


def test_cluster_by_noop_under_bucketed_layout(spark, layout_dir):
    """cluster_by must add an exchange on raw parquet and add NOTHING when
    the scan is already bucket-partitioned on the key."""
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_suppkey")
    with_shuffle = cbo.cluster_by(li, spark, SF, "lineitem", "l_orderkey")
    plan = with_shuffle._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" in plan
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    li_b = load_table(spark, "lineitem", SF).select("l_orderkey", "l_suppkey")
    no_shuffle = cbo.cluster_by(li_b, spark, SF, "lineitem", "l_orderkey")
    plan_b = no_shuffle._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan_b, plan_b


def test_q111_zero_fact_shuffle_under_layout(spark, layout_dir):
    """Under the orderkey-bucketed layout q111's single fact shuffle
    disappears entirely: groupBy and window both ride the bucket
    partitioning (subset rule) — and results match the raw-parquet run."""
    from highs_duckdb_spark.operators.tpch_extra2 import q111_last_to_ship_suppliers

    plain = [tuple(r) for r in q111_last_to_ship_suppliers(spark, SF).collect()]
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    df = q111_last_to_ship_suppliers(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert [tuple(r) for r in df.collect()] == plain


def test_dim_broadcast_and_scale_demotion(spark, monkeypatch):
    """A dim below the cap broadcasts; above it, it takes the
    co-partitioned strategy (never an unbounded broadcast at 100 TB)."""
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)

    def build():
        g = cbo.JoinGraph(spark, SF)
        g.fact("orders", orders)
        g.fact("customer", cust)
        g.edge("orders", "o_custkey", "customer", "c_custkey")
        g.dim(
            "nation",
            nation,
            F.col("c_nationkey") == F.col("n_nationkey"),
            after=("customer",),
        )
        return g

    g = build()
    df = g.plan()
    assert g.explain.broadcasts == ("nation",)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    monkeypatch.setattr(cbo, "BROADCAST_CAP_BYTES", 0)
    g2 = build()
    df2 = g2.plan()
    assert g2.explain.demoted_dims == ("nation",)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan2, plan2


def test_dim_alt_copy_makes_semi_join_exchange_free(spark, layout_dir):
    """A fact_scale dim declared with prepare=/key= scans the layout's
    key-clustered copy: the demoted semi/anti join is exchange-free on
    BOTH sides (q12/q13-class) and results match the plain run."""
    from highs_duckdb_spark.operators import QUERIES

    plain = {
        n: [tuple(r) for r in QUERIES[n].builder(spark, SF).collect()]
        for n in ("q12_semi_join", "q13_anti_join")
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    for n in ("q12_semi_join", "q13_anti_join"):
        df = QUERIES[n].builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "orders__by_custkey" in plan, (n, plan)
        # the join itself is exchange-free: the only hash exchange left is
        # the tiny final mktsegment aggregation's
        assert plan.count("Exchange hashpartitioning(c_custkey") == 0, (n, plan)
        assert plan.count("Exchange hashpartitioning(o_custkey") == 0, (n, plan)
        assert [tuple(r) for r in df.collect()] == plain[n], n


def test_fact_scale_dim_never_broadcasts(spark):
    """A dim declared fact_scale=True must take the co-partitioned
    strategy even when today's measured bytes clear the broadcast cap —
    the growth class, not the test-scale size, drives the encoding."""
    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    g = cbo.JoinGraph(spark, SF)
    g.fact("customer", cust)
    g.dim(
        "orders",
        orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        after=("customer",),
        how="left_semi",
        fact_scale=True,
    )
    df = g.plan()
    assert g.explain.demoted_dims == ("orders",)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan


def test_dim_chain_attaches_in_dependency_order(spark):
    """region depends on nation's column: both must attach (fixpoint) and
    the result must match the flat SQL join."""
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", orders)
    g.fact("customer", cust)
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.dim(
        "nation",
        load_table(spark, "nation", SF),
        F.col("c_nationkey") == F.col("n_nationkey"),
        after=("customer",),
    )
    g.dim(
        "region",
        load_table(spark, "region", SF),
        F.col("n_regionkey") == F.col("r_regionkey"),
        after=("nation",),
    )
    n = g.plan().count()
    assert n == orders.count()  # FK chain: every order survives


def test_unattachable_dim_raises(spark):
    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", load_table(spark, "orders", SF))
    g.dim(
        "nation",
        load_table(spark, "nation", SF),
        F.col("c_nationkey") == F.col("n_nationkey"),
        after=("customer",),  # never declared
    )
    with pytest.raises(ValueError, match="never became attachable"):
        g.plan()


def test_disconnected_graph_raises(spark):
    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", load_table(spark, "orders", SF))
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    with pytest.raises(ValueError, match="disconnected"):
        g.plan()


def _graph_q65_prepared(spark):
    """q65's fact graph with orders declared via prepare= (opts into the
    layout's alternate clustered copies)."""

    def in_window(df):
        return df.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )

    g = cbo.JoinGraph(spark, SF)
    g.fact("orders", load_table(spark, "orders", SF), sel=0.30, prepare=in_window)
    g.fact("customer", load_table(spark, "customer", SF))
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    return g


def test_alt_copy_selected_under_layout(spark, layout_dir):
    """With the layout attached, orders must scan its custkey-clustered
    COPY (orders joins customer exchange-free on both sides) and the fact
    tree must carry exactly ONE hash exchange — the pruned join output
    moving to hash(orderkey) for bucketed lineitem."""
    g = _graph_q65_prepared(spark)
    g.plan()
    assert g.explain.alt_copies == ()  # no layout: primary copy only
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g2 = _graph_q65_prepared(spark)
    df = g2.plan()
    assert g2.explain.alt_copies == (("orders", "o_custkey"),), g2.explain
    # copy selection is strictly cheaper than the primary-only layout plan
    assert g2.explain.shuffled_bytes < g.explain.shuffled_bytes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange hashpartitioning(o_orderkey" in plan, plan


def test_alt_copy_results_equal_primary(spark, layout_dir):
    """The alternate clustered copy holds the same rows: plans built from
    it must return byte-identical results to the primary path."""
    plain = {tuple(r) for r in _graph_q65_prepared(spark).plan().collect()}
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65_prepared(spark)
    assert {tuple(r) for r in g.plan().collect()} == plain
    assert g.explain.alt_copies  # the equality above exercised the copy


def test_alt_copies_cleared_with_overrides(spark, layout_dir):
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    assert L.alt_clustered_copies(spark, SF, "orders")
    clear_table_overrides(spark)
    assert L.alt_clustered_copies(spark, SF, "orders") == {}


def _graph_q65_columns(spark, extra_li_cols=()):
    """q65's fact graph declared with columns= (opts into planner-level
    materialized-projection matching, VERDICT r05 item 2)."""

    def in_window(df):
        return df.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )

    g = cbo.JoinGraph(spark, SF)
    g.fact(
        "orders",
        load_table(spark, "orders", SF),
        sel=0.30,
        prepare=in_window,
        columns=("o_custkey", "o_orderdate"),
    )
    g.fact("customer", load_table(spark, "customer", SF))
    g.fact(
        "lineitem",
        load_table(spark, "lineitem", SF),
        columns=("l_suppkey", "l_extendedprice", "l_discount", *extra_li_cols),
    )
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    return g


def test_projection_matching_substitutes_and_matches_rows(spark, layout_dir):
    """With the layout attached, the planner must substitute
    lineitem_orders for the lineitem⋈orders pair — identical answers over
    the DECLARED columns (the matching contract — the projection carries a
    column subset, so the query may only touch what it declared), zero
    base-fact scans, explain records the rewrite."""

    def answer(df):
        return {
            tuple(r)
            for r in df.groupBy("o_custkey")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("s"),
                F.min("o_orderdate").alias("d"),
                F.max("l_suppkey").alias("k"),
            )
            .collect()
        }

    plain = answer(_graph_q65_columns(spark).plan())
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65_columns(spark)
    df = g.plan()
    assert g.explain.projections == (("lineitem_orders", ("lineitem", "orders")),)
    assert "lineitem_orders" in g.explain.order
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "/lineitem]" not in plan and "/orders]" not in plan, plan
    assert answer(df) == plain


def test_projection_matching_requires_column_subsumption(spark, layout_dir):
    """A query touching a lineitem column OUTSIDE the projection
    (l_tax — the advisor widening folded l_quantity IN) must NOT be
    rewritten onto it: lineitem declares no residual key (its unique key
    is composite and not carried), so no rejoin can serve the column."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65_columns(spark, extra_li_cols=("l_tax",))
    g.plan()
    assert g.explain.projections == ()


def test_projection_matching_requires_opt_in(spark, layout_dir):
    """Facts without columns= (no prepare-completeness contract) are never
    rebased onto a projection — the planner can't prove their filters are
    reproducible there."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65_prepared(spark)  # prepare= but no columns=
    g.plan()
    assert g.explain.projections == ()


def test_projection_matching_without_layout_is_inert(spark):
    g = _graph_q65_columns(spark)
    g.plan()
    assert g.explain.projections == ()
    assert set(g.explain.order) == {"orders", "customer", "lineitem"}


def test_projection_pickup_across_registered_queries(spark, layout_dir):
    """VERDICT r05 item 2 'done' bar: queries beyond q64/q65 pick the
    projection up with ZERO query changes — and queries touching columns
    outside it decline, all result-identical to their plain runs."""
    from highs_duckdb_spark.operators import QUERIES

    # round 7: q104 rides the widened projection (l_returnflag added) with
    # zero query changes — VERDICT r06 item 2's 'done' bar. q103 and q96
    # ride too after the ADVISOR-driven widening (l_partkey + l_quantity —
    # the union of their recorded missing_columns declines; q96 also
    # needed its probe-side rename artifact fixed so the edge key is the
    # real column). A genuinely-outside column still declines: pinned with
    # a synthetic graph in test_widened_projection_still_declines_outside
    # (no registered query declines any more — exactly what the advisor
    # was for).
    picks = [
        "q105_shipping_delay_buckets",
        "q104_returned_items",
        "q103_product_profit",
        "q96_large_volume_customers",
    ]
    # round 8: q101/q102 graduated PAST the projection — they now ride
    # the rev_by_nation_year AGGREGATE MV (finer lever, same zero query
    # changes); their plans must scan the MV and neither base fact nor
    # the projection
    mv_picks = ["q101_volume_shipping", "q102_market_share"]
    declines: list[str] = []
    plain = {
        n: [tuple(r) for r in QUERIES[n].builder(spark, SF).collect()]
        for n in picks + mv_picks + declines
    }
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    for n in picks + declines:
        df = QUERIES[n].builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ("lineitem_orders" in plan) == (n in picks), (n, plan)
        assert [tuple(r) for r in df.collect()] == plain[n], n
    for n in mv_picks:
        df = QUERIES[n].builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rev_by_nation_year" in plan, (n, plan)
        assert "lineitem_orders" not in plan, (n, plan)
        assert [tuple(r) for r in df.collect()] == plain[n], n


def test_widened_projection_still_declines_outside_columns(spark, layout_dir):
    """A column genuinely outside even the widened projection (l_tax)
    must still decline, with the machine-readable missing_columns reason
    the advisor aggregates."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF), columns=("l_tax",))
    g.fact("orders", load_table(spark, "orders", SF), columns=("o_orderdate",))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.plan()
    assert g.explain.projections == ()
    declines = dict(g.explain.projection_declines)
    assert declines.get("lineitem_orders") == "missing_columns:l_tax"


def test_facts_without_prepare_never_take_alt_copies(spark, layout_dir):
    """A fact declared with a pre-filtered df (no prepare=) must never be
    silently re-based onto another copy — the planner can't reproduce the
    caller's filters there."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65(spark)  # pre-filtered orders, no prepare
    g.plan()
    assert g.explain.alt_copies == ()


# --- round 7: NDV-aware cardinality, arity fallback, stat-proxy guard -------


def _write_m2m_tables(tmp_path):
    """Three parquet tables where BYTE-ONLY ranking picks the wrong join
    order: `b` (smaller bytes) joins `a` on a 10-distinct many-to-many key
    (output explodes to |a|·|b|/10), while `c` (slightly larger bytes)
    joins `a` on a unique FK (output stays |a|-sized)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_a, n_b, n_c = 10_000, 5_000, 8_000
    pq.write_table(
        pa.table(
            {
                "a_m2m": pa.array([i % 10 for i in range(n_a)], pa.int64()),
                "a_fk": pa.array(list(range(n_a)), pa.int64()),
                "a_pay": pa.array([f"a{i:08d}" for i in range(n_a)]),
            }
        ),
        str(tmp_path / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "b_key": pa.array([i % 10 for i in range(n_b)], pa.int64()),
                "b_pay": pa.array([f"b{i:08d}" for i in range(n_b)]),
            }
        ),
        str(tmp_path / "b.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_key": pa.array(list(range(n_c)), pa.int64()),
                "c_pay": pa.array([f"c{i:08d}" for i in range(n_c)]),
            }
        ),
        str(tmp_path / "c.parquet"),
    )


def _m2m_graph(spark, sf_dir):
    g = cbo.JoinGraph(spark, str(sf_dir))
    for t in ("a", "b", "c"):
        g.fact(t, spark.read.parquet(str(sf_dir / f"{t}.parquet")))
    g.edge("a", "a_m2m", "b", "b_key")
    g.edge("a", "a_fk", "c", "c_key")
    return g


def test_ndv_ranking_defers_many_to_many_join(spark, tmp_path):
    """VERDICT r06 item 1 'done' bar: byte-only ranking (stats disabled)
    joins the smaller-bytes many-to-many side first; NDV-aware ranking
    sees the |a|·|b|/10 explosion and defers it to last."""
    _write_m2m_tables(tmp_path)
    g = _m2m_graph(spark, tmp_path)
    order = g.plan() and g.explain.order
    assert order.index("c") < order.index("b"), order
    # the estimate itself shows the explosion: an (a, b, c) prefix carries
    # a multi-million-row intermediate into the c join
    est = cbo._TreeEst(g._facts["a"])
    est.join(g._facts["b"], "a_m2m", "b_key")
    assert est.rows == pytest.approx(10_000 * 5_000 / 10)


def test_byte_only_ranking_misranks_without_stats(spark, tmp_path, monkeypatch):
    """The same graph WITHOUT the NDV statistic (kill switch): bytes rank
    the smaller b first — the mis-ranking the statistic exists to fix. If
    this ever starts passing NDV-style, the fallback model changed."""
    _write_m2m_tables(tmp_path)
    monkeypatch.setenv("HDS_DISABLE_PRUNING", "1")
    g = _m2m_graph(spark, tmp_path)
    assert all(f.rows is None for f in g._facts.values())
    g.plan()
    order = g.explain.order
    assert order.index("b") < order.index("c"), order


def test_wide_graph_plans_via_greedy_fallback(spark):
    """VERDICT r06 item 4 'done' bar: a 10-fact chain (10! = 3.6 M
    permutations — a hang under exhaustive enumeration) plans through the
    greedy fallback in well under 100 ms of enumeration time, with a
    connected left-deep order."""
    import time

    n = 10
    g = cbo.JoinGraph(spark, SF)
    for i in range(n):
        df = spark.range(5).select(
            F.col("id").alias(f"a{i}"), F.col("id").alias(f"b{i}")
        )
        g.fact(f"f{i}", df, table=f"nosuch{i}")
    for i in range(n - 1):
        g.edge(f"f{i}", f"b{i}", f"f{i+1}", f"a{i+1}")
    t0 = time.perf_counter()
    order, cost = g._greedy_order()
    enum_s = time.perf_counter() - t0
    assert enum_s < 0.1, enum_s
    assert order is not None and len(order) == n
    for i in range(1, n):
        assert g._edge_between(set(order[:i]), order[i]) is not None
    df = g.plan()  # full build path (joins construct through Py4J)
    assert len(g.explain.order) == n
    assert df.count() == 5  # chained equi-joins over identical ranges


def test_stat_proxy_fact_never_fused_onto_projection(spark, layout_dir):
    """ADVICE r06: a fact with explicit part_keys= (table is only a stat
    proxy — different rows) must decline projection matching even when it
    also declares columns=."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _graph_q65_columns(spark)
    # re-declare lineitem as a stat proxy: same df, explicit part_keys
    li = g._facts["lineitem"]
    g.fact(
        "lineitem",
        li.df,
        table="lineitem",
        part_keys=frozenset(),
        columns=tuple(li.columns),
    )
    g.plan()
    assert g.explain.projections == ()


# --- round 7: generalized view matching (aliasing, residual, chains) --------


def test_projection_key_aliasing_serves_dropped_join_key(spark, layout_dir):
    """o_orderkey is dropped from the projection as a duplicate of
    l_orderkey; a query needing it must still substitute, with the fused
    frame serving o_orderkey from its surviving twin (inner equi-join rows
    have equal keys), result-identical to the base plan."""
    def build(g_extra_orders):
        g = cbo.JoinGraph(spark, SF)
        g.fact(
            "orders",
            load_table(spark, "orders", SF),
            columns=("o_custkey", "o_orderdate", "o_orderkey"),
        )
        g.fact("customer", load_table(spark, "customer", SF))
        g.fact(
            "lineitem",
            load_table(spark, "lineitem", SF),
            columns=("l_suppkey", "l_extendedprice"),
        )
        g.edge("orders", "o_custkey", "customer", "c_custkey")
        g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
        return g

    def answer(df):
        return {
            tuple(r)
            for r in df.groupBy("o_orderkey")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
            .collect()
        }

    plain = answer(build(None).plan())
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = build(None)
    df = g.plan()
    assert g.explain.projections == (("lineitem_orders", ("lineitem", "orders")),)
    assert answer(df) == plain


def test_projection_residual_rejoin_pulls_base_columns(spark, layout_dir, monkeypatch):
    """o_totalprice is outside the projection; the spec's residual key
    (orders is uniquely keyed by o_orderkey, carried as l_orderkey) pulls
    it back losslessly — substitution recorded, rows identical to base.

    table_bytes is patched to at-scale proportions: at sf0.001 the
    projection's parquet is metadata-dominated and BIGGER than lineitem,
    so the byte guard (correctly) declines on real toy-scale stats — the
    guard's own decline is pinned in the test below."""
    def build():
        g = cbo.JoinGraph(spark, SF)
        g.fact(
            "orders",
            load_table(spark, "orders", SF),
            columns=("o_custkey", "o_orderdate", "o_totalprice"),
        )
        g.fact("customer", load_table(spark, "customer", SF))
        g.fact(
            "lineitem",
            load_table(spark, "lineitem", SF),
            columns=("l_suppkey", "l_extendedprice"),
        )
        g.edge("orders", "o_custkey", "customer", "c_custkey")
        g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
        return g

    def answer(df):
        return {
            tuple(r)
            for r in df.groupBy("c_custkey")
            .agg(
                F.round(F.sum("o_totalprice"), 2).alias("tp"),
                F.count("*").alias("n"),
            )
            .collect()
        }

    plain = answer(build().plan())
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    real = cbo.table_bytes
    monkeypatch.setattr(
        cbo,
        "table_bytes",
        lambda sf, t: {"lineitem": 10 << 20, "orders": 1 << 20}.get(t, real(sf, t)),
    )
    g = build()
    df = g.plan()
    assert g.explain.projections == (("lineitem_orders", ("lineitem", "orders")),)
    assert answer(df) == plain


def test_projection_residual_byte_guard_declines(spark, layout_dir, monkeypatch):
    """When projection + residual scans would EXCEED the absorbed base
    scans (tiny fact tables), the residual rewrite must decline — the
    reconstruction join would cost more than it saves."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    monkeypatch.setattr(cbo, "table_bytes", lambda sf, t: 1)
    g = cbo.JoinGraph(spark, SF)
    g.fact(
        "orders",
        load_table(spark, "orders", SF),
        columns=("o_custkey", "o_totalprice"),
    )
    g.fact(
        "lineitem", load_table(spark, "lineitem", SF), columns=("l_extendedprice",)
    )
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.plan()
    assert g.explain.projections == ()


def test_chain_spec_three_table_projection_substitutes(spark, layout_dir, monkeypatch):
    """A 3-table chain projection (lineitem⋈orders⋈customer) fuses a
    3-fact subgraph into ONE projection scan — the multi-edge substitution
    VERDICT r06 item 2 called out as missing."""
    chain = {
        "tables": ["lineitem", "orders", "customer"],
        "joins": [
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
        ],
        "columns": [
            "l_orderkey",
            "l_extendedprice",
            "o_orderdate",
            "c_custkey",
            "c_mktsegment",
        ],
        "bucket_cols": ["c_custkey"],
        "sort_cols": ["c_custkey"],
    }
    specs = dict(L.JOIN_PROJECTION_SPECS)
    specs["li_ord_cust"] = chain
    monkeypatch.setattr(L, "JOIN_PROJECTION_SPECS", specs)

    def build():
        g = cbo.JoinGraph(spark, SF)
        g.fact(
            "lineitem", load_table(spark, "lineitem", SF), columns=("l_extendedprice",)
        )
        g.fact("orders", load_table(spark, "orders", SF), columns=("o_orderdate",))
        g.fact(
            "customer", load_table(spark, "customer", SF), columns=("c_mktsegment",)
        )
        g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
        g.edge("orders", "o_custkey", "customer", "c_custkey")
        return g

    def answer(df):
        return {
            tuple(r)
            for r in df.groupBy("c_mktsegment")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
            .collect()
        }

    plain = answer(build().plan())
    try:
        L.attach_bucketed(spark, SF, layout_dir, buckets=4)
        g = build()
        df = g.plan()
        assert ("li_ord_cust", ("lineitem", "orders", "customer")) in g.explain.projections
        assert g.explain.order == ("li_ord_cust",)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "/lineitem]" not in plan and "/orders]" not in plan, plan
        assert answer(df) == plain
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(layout_dir, 'li_ord_cust')}")


# --- round 7: dim row-reduction factors in the cost model --------------------


def test_dim_row_factor_model():
    """The declared-sel → tree-row-reduction mapping (``_Dim.row_factor``
    docstring): inner/semi retain sel, anti retains 1−sel ONLY under a
    declared filter (default sel=1.0 means the probe's match rate is the
    unknown, not its filter), outer shapes preserve tree rows."""
    mk = lambda how, sel: cbo._Dim(  # noqa: E731
        name="d", df=None, cond=None, after=(), bytes=1.0, how=how, sel=sel
    )
    assert mk("inner", 0.2).row_factor == pytest.approx(0.2)
    assert mk("left_semi", 0.2).row_factor == pytest.approx(0.2)
    assert mk("left_anti", 0.2).row_factor == pytest.approx(0.8)
    assert mk("left_anti", 1.0).row_factor == 1.0  # unknown match rate
    assert mk("left", 0.2).row_factor == 1.0
    assert mk("left_outer", 0.2).row_factor == 1.0
    assert mk("inner", 1.0).row_factor == 1.0


def _write_chain_tables(tmp_path):
    """a (large, FK→b, dim key) — b (FK→c) — c, plus dim table d: the
    shape where a SELECTIVE dim on `a` makes a-first orders cheap (every
    downstream shuffle shrinks 100×) while without the dim stat the
    cheapest orders leave the big `a` for last."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_a, n_b, n_d = 100_000, 10_000, 100
    digest = lambda i: hashlib.md5(str(i).encode()).hexdigest()  # noqa: E731
    pq.write_table(
        pa.table(
            {
                "a_bk": pa.array([i % n_b for i in range(n_a)], pa.int64()),
                "a_dk": pa.array([i % n_d for i in range(n_a)], pa.int64()),
                "a_pay": pa.array([digest(i) for i in range(n_a)]),
            }
        ),
        str(tmp_path / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "b_key": pa.array(list(range(n_b)), pa.int64()),
                "b_ck": pa.array(list(range(n_b)), pa.int64()),
            }
        ),
        str(tmp_path / "b.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_key": pa.array(list(range(n_b)), pa.int64()),
                "c_pay": pa.array([digest(-i) for i in range(n_b)]),
            }
        ),
        str(tmp_path / "c.parquet"),
    )
    pq.write_table(
        pa.table({"d_key": pa.array(list(range(n_d)), pa.int64())}),
        str(tmp_path / "d.parquet"),
    )


def _chain_graph(spark, sf_dir, dim_sel):
    g = cbo.JoinGraph(spark, str(sf_dir))
    for t in ("a", "b", "c"):
        g.fact(t, spark.read.parquet(str(sf_dir / f"{t}.parquet")))
    g.edge("a", "a_bk", "b", "b_key")
    g.edge("b", "b_ck", "c", "c_key")
    d = spark.read.parquet(str(sf_dir / "d.parquet"))
    if dim_sel < 1.0:
        d = d.filter(F.col("d_key") == 0)
    g.dim(
        "d", d, F.col("a_dk") == F.col("d_key"), after=("a",), sel=dim_sel
    )
    return g


def test_selective_dim_flips_join_order(spark, tmp_path):
    """A sel=0.01 dim on the big fact `a` must pull `a` to the FRONT of
    the order (its reduction shrinks every downstream shuffle); the same
    graph with an unfiltered dim (sel=1.0, factor 1.0) leaves `a` LAST —
    the round-6 model's answer, still right without the reduction."""
    _write_chain_tables(tmp_path)
    g = _chain_graph(spark, tmp_path, dim_sel=0.01)
    df = g.plan()
    assert g.explain.order[0] == "a", g.explain.order
    assert g.explain.broadcasts == ("d",)
    # the reduction is visible in the costs themselves
    assert g._simulate(("a", "b", "c")) < g._simulate(("c", "b", "a"))
    # and the plan runs: 1% of a's rows survive the dim, each matching
    # exactly one b and one c row
    assert df.count() == 1_000

    g1 = _chain_graph(spark, tmp_path, dim_sel=1.0)
    g1.plan()
    assert g1.explain.order[-1] == "a", g1.explain.order
    assert g1._simulate(("c", "b", "a")) < g1._simulate(("a", "b", "c"))


# --- round 7: eager aggregation (group-by pushdown below joins) ---------------


def _eager_graph(spark, filtered_orders=True):
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    orders = load_table(spark, "orders", SF)
    if filtered_orders:
        orders = orders.filter(
            F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
        )
    g.fact("orders", orders, sel=0.3 if filtered_orders else 1.0)
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.aggregate(
        ("o_orderpriority",),
        {
            "qty_dec": ("sum", F.col("l_quantity").cast("decimal(12,2)"), ("l_quantity",)),
            "n_items": ("count", "*"),
            "last_ship": ("max", "l_shipdate"),
            "avg_qty": ("avg", "l_quantity"),
        },
    )
    return g


def test_eager_agg_fires_and_matches_lazy(spark, monkeypatch):
    """The rewrite's full contract on real tables: fires on the q181 shape
    (all aggregate inputs on single-edge lineitem), the executed plan
    carries the partial aggregate BELOW the join, and rows AND dtypes are
    identical to the lazy plan — including the decimal Sum cast (lazy
    sum(dec(12,2)) = dec(22,2); the eager double-Sum would be dec(32,2)
    without the cast) and avg's sum/count decomposition."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = _eager_graph(spark)
    df = g.plan()
    assert g.explain.eager_agg == ("lineitem", ("l_orderkey",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__p_qty_dec" in plan  # partial agg exists below the join
    eager_rows = sorted(df.collect())
    eager_schema = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    monkeypatch.setenv("HDS_DISABLE_EAGER_AGG", "1")
    g2 = _eager_graph(spark)
    df2 = g2.plan()
    assert g2.explain.eager_agg == ()
    assert g2.explain.eager_decline == "disabled"
    assert "__p_" not in df2._jdf.queryExecution().executedPlan().toString()
    assert eager_schema == [
        (f.name, f.dataType.simpleString()) for f in df2.schema.fields
    ]
    assert eager_rows == sorted(df2.collect())


def test_eager_agg_declines_dim_conditioned_fact(spark, monkeypatch):
    """A dim whose condition needs the carrier fact's columns (after=
    names it) breaks the uniform-multiplicity argument — must decline."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = _eager_graph(spark)
    sup = load_table(spark, "supplier", SF)
    g.dim(
        "supplier", sup, F.col("l_suppkey") == F.col("s_suppkey"),
        after=("lineitem",),
    )
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline == "dim_conditioned:lineitem"
    # and the lazy aggregate still computes (sanity: 5 priorities)
    assert df.count() == 5


def test_eager_agg_declines_without_stats(spark, monkeypatch):
    """No sidecar stats (kill switch) → no reduction prediction → lazy."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    monkeypatch.setenv("HDS_DISABLE_PRUNING", "1")
    g = _eager_graph(spark)
    g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline == "no_row_stats"


def test_eager_agg_declines_on_low_reduction(spark, monkeypatch):
    """The NDV gate: lineitem by l_orderkey predicts ~4 rows per group —
    raising the threshold above that must decline with the predicted
    factor in the reason (the stat, not a hard-coded shape, is what
    decides)."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_REDUCTION", 10.0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.fact("orders", load_table(spark, "orders", SF))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.aggregate(
        ("o_orderpriority",),
        {"n": ("count", "*"), "q": ("sum", "l_quantity")},
    )
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline.startswith("reduction:")
    reduction = float(g.explain.eager_decline.split(":")[1])
    assert 1.5 < reduction < 10.0  # ~4 items/order at every SF
    # the lazy aggregate serves the declared keys/aggs unchanged
    assert df.columns == ["o_orderpriority", "n", "q"]


def test_eager_agg_declines_when_group_keys_break_copartition(spark, monkeypatch):
    """Carrier-side group keys beyond the join key make the pre-aggregate
    hash on (k ∪ gT) and force a SECOND exchange back to k for the join —
    without storage bucketing covering the pre-keys the rewrite must
    decline (lazy shuffles the fact once; eager would shuffle twice)."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.fact("orders", load_table(spark, "orders", SF))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.aggregate(
        ("l_returnflag", "o_orderpriority"),
        {"q": ("sum", "l_quantity")},
    )
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline == "pre_keys_exceed_join_key"
    assert df.columns == ["l_returnflag", "o_orderpriority", "q"]


def test_eager_agg_plan_is_idempotent(spark, monkeypatch):
    """A second plan() on the same graph must NOT re-rewrite the already
    pre-aggregated carrier (which would aggregate twice) — it reuses the
    first rewrite and returns identical results."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = _eager_graph(spark)
    first = sorted(g.plan().collect())
    assert g.explain.eager_agg == ("lineitem", ("l_orderkey",))
    second = sorted(g.plan().collect())
    assert g.explain.eager_agg == ("lineitem", ("l_orderkey",))
    assert first == second


def test_eager_agg_declines_below_bytes_floor(spark):
    """At test scale the carrier is a few MB: the ABSOLUTE-benefit gate
    declines (the rewrite's plan-construction cost is data-size-invariant
    while its benefit scales with data — the broadcast-threshold
    reasoning applied to a rewrite). The sf10/sf100 A/Bs price the fire
    side (BENCH_SCALING round 7)."""
    g = _eager_graph(spark)
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline.startswith("carrier_bytes:")
    assert df.count() == 5  # lazy path serves the aggregate unchanged


def test_eager_agg_declines_single_fact_graph(spark, monkeypatch):
    """A one-fact graph (dims only) has no fact join to push below — the
    aggregate must run lazily with the machine-readable reason (the q10
    shape: fact + broadcast dim, where the lazy plan's map-side partial
    combine is already optimal)."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.dim(
        "part",
        load_table(spark, "part", SF),
        F.col("l_partkey") == F.col("p_partkey"),
        after=("lineitem",),
    )
    g.aggregate(("p_brand",), {"n": ("count", "*")})
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline == "single_fact"
    assert df.columns == ["p_brand", "n"]


# --- round 8: ADVICE r07 fixes ------------------------------------------------


def test_eager_agg_declines_column_expr_without_cols(spark, monkeypatch):
    """A Column agg expr with NO declared input columns must DECLINE (not
    crash): need=∅ is a subset of every fact's columns, so the old carrier
    gate could pick a fact lacking the expr's real inputs and raise inside
    plan() — the documented contract is that omitting cols only costs the
    optimization, never correctness (ADVICE r07)."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.fact("orders", load_table(spark, "orders", SF))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    # o_totalprice lives on ORDERS; with cols undeclared the old gate saw
    # need=∅ ⊆ lineitem.columns and built an unanalyzable pre-aggregate
    g.aggregate(("o_orderpriority",), {"t": ("sum", F.col("o_totalprice") * 2)})
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline == "column_expr_no_cols:t"
    assert df.columns == ["o_orderpriority", "t"]
    assert df.count() == 5  # lazy path serves the aggregate unchanged


def test_eager_agg_decimal_expr_without_cast_text(spark, tmp_path, monkeypatch):
    """A decimal-TYPED Column expr with no 'DECIMAL' in its expression
    text (decimal source column × plain column) must still get the combine
    cast-back: the schema probe fires for ANY Column expr instead of
    text-matching str(expr) (ADVICE r07). Without it the eager plan's Sum
    widens twice (dec(p+20)) and the output schema diverges from lazy."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    sfd = str(tmp_path)
    (
        spark.range(0, 4000)
        .select(
            (F.col("id") % 1000).alias("k"),
            F.col("id").cast("decimal(10,2)").alias("d"),
            (F.col("id") % 7).alias("m"),
        )
        .coalesce(1)
        .write.parquet(sfd + "/facttab.parquet")
    )
    (
        spark.range(0, 1000)
        .select(F.col("id").alias("k2"), (F.col("id") % 5).alias("grp"))
        .coalesce(1)
        .write.parquet(sfd + "/dimtab.parquet")
    )

    def build(g):
        g.fact("facttab", spark.read.parquet(sfd + "/facttab.parquet"))
        g.fact("dimtab", spark.read.parquet(sfd + "/dimtab.parquet"))
        g.edge("facttab", "k", "dimtab", "k2")
        # str(expr) is "(d * m)" — no cast, no DECIMAL text
        g.aggregate(("grp",), {"s": ("sum", F.col("d") * F.col("m"), ("d", "m"))})
        return g.plan()

    g = cbo.JoinGraph(spark, sfd)
    df = build(g)
    assert g.explain.eager_agg == ("facttab", ("k",)), g.explain.eager_decline
    monkeypatch.setenv("HDS_DISABLE_EAGER_AGG", "1")
    g2 = cbo.JoinGraph(spark, sfd)
    df2 = build(g2)
    assert g2.explain.eager_agg == ()
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in df2.schema.fields
    ]
    assert sorted(df.collect()) == sorted(df2.collect())


def test_eager_agg_decimal_literal_over_plain_columns(spark, tmp_path, monkeypatch):
    """A decimal LITERAL in the agg expr with NO decimal input columns and
    no cast text (VERDICT r08 item 6 — the documented residual hole):
    str(expr) renders Decimal("1.5") identically to float 1.5, so the
    fractional-literal token must trigger the schema probe. Without it the
    eager Sum widens twice and the fire-path schema diverges from lazy."""
    from decimal import Decimal

    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    sfd = str(tmp_path)
    (
        spark.range(0, 4000)
        .select(
            (F.col("id") % 1000).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .coalesce(1)
        .write.parquet(sfd + "/facttab.parquet")
    )
    (
        spark.range(0, 1000)
        .select(F.col("id").alias("k2"), (F.col("id") % 5).alias("grp"))
        .coalesce(1)
        .write.parquet(sfd + "/dimtab.parquet")
    )

    def build(g):
        g.fact("facttab", spark.read.parquet(sfd + "/facttab.parquet"))
        g.fact("dimtab", spark.read.parquet(sfd + "/dimtab.parquet"))
        g.edge("facttab", "k", "dimtab", "k2")
        # str(expr) is "(v * 1.5)" — bigint input, decimal-typed literal
        g.aggregate(
            ("grp",), {"s": ("sum", F.col("v") * F.lit(Decimal("1.5")), ("v",))}
        )
        return g.plan()

    g = cbo.JoinGraph(spark, sfd)
    df = build(g)
    assert g.explain.eager_agg == ("facttab", ("k",)), g.explain.eager_decline
    monkeypatch.setenv("HDS_DISABLE_EAGER_AGG", "1")
    g2 = cbo.JoinGraph(spark, sfd)
    df2 = build(g2)
    assert g2.explain.eager_agg == ()
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in df2.schema.fields
    ]
    assert sorted(df.collect()) == sorted(df2.collect())


def test_eager_agg_drops_noncovering_copies(spark, monkeypatch):
    """After the rewrite, alternate copies whose bucket keys are not a
    subset of the pre-aggregate keys no longer have their claimed output
    partitioning (the groupBy exchanges them to pre_keys) — they must be
    dropped so _entry_keys/_simulate can't credit an exchange-free fact
    side that actually exchanges (ADVICE r07; cost misestimate only)."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = _eager_graph(spark)
    li = g._facts["lineitem"]
    li.copies = {
        frozenset({"l_orderkey"}): li.df,
        frozenset({"l_suppkey"}): li.df,
    }
    g.plan()
    assert g.explain.eager_agg == ("lineitem", ("l_orderkey",))
    assert set(g._facts["lineitem"].copies) == {frozenset({"l_orderkey"})}


# --- round 8: aggregate materialized views ------------------------------------


def _q65_graph(spark, *, window=None, opaque_orders=False, group_keys=("n_name",),
               sup_catalog_rows=True, nation_unique=True, sf=SF):
    """The q65/TPC-H-Q5 declaration with knobs for decline tests."""
    import datetime as dt

    from highs_duckdb_spark.functions.money import cents

    SF = sf  # noqa: N806 — keep the body's references on the chosen dir
    lo, hi = window or (dt.datetime(1996, 1, 1), dt.datetime(1998, 1, 1))
    g = cbo.JoinGraph(spark, SF)
    orders = load_table(spark, "orders", SF)
    if opaque_orders:
        g.fact(
            "orders", orders, sel=0.3,
            prepare=lambda df: df.filter(
                (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
            ),
            columns=("o_custkey", "o_orderdate"),
        )
    else:
        g.fact(
            "orders", orders, sel=0.3,
            range_filter=("o_orderdate", lo, hi),
            columns=("o_custkey", "o_orderdate"),
        )
    g.fact("customer", load_table(spark, "customer", SF),
           columns=("c_custkey", "c_nationkey"))
    g.fact("lineitem", load_table(spark, "lineitem", SF),
           columns=("l_suppkey", "l_extendedprice", "l_discount"))
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.dim(
        "supplier", load_table(spark, "supplier", SF),
        on=("l_suppkey", "s_suppkey"), extra_eq=("c_nationkey", "s_nationkey"),
        after=("lineitem", "customer"), unique_key=True,
        catalog_rows=sup_catalog_rows,
    )
    g.dim(
        "nation", load_table(spark, "nation", SF),
        on=("s_nationkey", "n_nationkey"), after=("supplier",),
        unique_key=nation_unique, catalog_rows=True,
    )
    g.aggregate(
        group_keys,
        {
            "revenue_c": (
                "sum",
                cents("l_extendedprice") * (100 - cents("l_discount")),
                ("l_extendedprice", "l_discount"),
            )
        },
    )
    return g


def test_agg_mv_serves_q65_shape(spark, layout_dir):
    """The headline contract (VERDICT r07 item 1): under an attached
    layout the planner substitutes the rev_by_nation_year aggregate MV
    for the WHOLE q65 graph — year-aligned window → o_year ∈ {1996,1997},
    local-supplier extra_eq → group-key filter, (n_name) regroup combines
    partials — and rows AND dtypes are identical to the lazy plan."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _q65_graph(spark)
    df = g.plan()
    assert g.explain.agg_mv == (
        "rev_by_nation_year",
        ("lineitem", "orders", "customer", "supplier"),
    ), g.explain.agg_mv_declines
    mv_rows = sorted(df.collect())
    mv_schema = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    # the executed plan must NOT scan lineitem (the MV replaced the join)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan or "rev_by_nation_year" in plan

    g2 = _q65_graph(spark)
    import os as _os

    _os.environ["HDS_DISABLE_AGG_MV"] = "1"
    try:
        df2 = g2.plan()
    finally:
        del _os.environ["HDS_DISABLE_AGG_MV"]
    assert g2.explain.agg_mv == ()
    assert mv_schema == [(f.name, f.dataType.simpleString()) for f in df2.schema.fields]
    assert mv_rows == sorted(df2.collect())


def test_agg_mv_declines_finer_grain(spark, layout_dir):
    """A FINER grouping than the MV's grain (o_orderdate is not a group
    key and no remaining dim serves it) must NOT match — the canonical
    wrong-rewrite an aggregate-MV matcher has to refuse."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _q65_graph(spark, group_keys=("n_name", "o_orderdate"))
    df = g.plan()
    assert g.explain.agg_mv == ()
    assert ("rev_by_nation_year", "group_key_unserved:o_orderdate") in (
        g.explain.agg_mv_declines
    )
    assert df.columns == ["n_name", "o_orderdate", "revenue_c"]


def test_agg_mv_declines_misaligned_window(spark, layout_dir):
    """A date window NOT aligned to year boundaries cannot be expressed
    on the year-grain MV — decline, and the lazy plan still answers
    (with the mid-year filter applied)."""
    import datetime as dt

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _q65_graph(spark, window=(dt.datetime(1996, 6, 1), dt.datetime(1998, 1, 1)))
    df = g.plan()
    assert g.explain.agg_mv == ()
    assert (
        "rev_by_nation_year",
        "filter_not_year_aligned:orders:o_orderdate",
    ) in g.explain.agg_mv_declines
    assert df.columns == ["n_name", "revenue_c"]


def test_agg_mv_declines_opaque_prepare(spark, layout_dir):
    """An opaque ``prepare`` (same filter, written by hand) can only be
    replayed, never subsumed — the matcher must decline rather than
    guess at the filter's semantics."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _q65_graph(spark, opaque_orders=True)
    g.plan()
    assert g.explain.agg_mv == ()
    assert ("rev_by_nation_year", "opaque_prepare:orders") in (
        g.explain.agg_mv_declines
    )


def test_agg_mv_declines_unasserted_dim_contracts(spark, layout_dir):
    """Absorption requires the dim's catalog_rows assertion (the MV was
    built from the FULL table); a remaining inner dim without the
    unique_key PK assertion could multiply partials — both must decline."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    g = _q65_graph(spark, sup_catalog_rows=False)
    g.plan()
    assert ("rev_by_nation_year", "no_catalog_rows_optin:supplier") in (
        g.explain.agg_mv_declines
    )
    g2 = _q65_graph(spark, nation_unique=False)
    g2.plan()
    assert ("rev_by_nation_year", "dim_multiplies:nation") in (
        g2.explain.agg_mv_declines
    )


def test_agg_mv_staleness_downgrades_to_lazy(spark, tmp_path):
    """VERDICT r08 item 4: a source mutated AFTER attach — outside the
    append/refresh maintenance paths — must not be served from stale MV
    partials. The guard (layout.agg_mv_stale, checked on the matcher's
    ACCEPT path only) compares the MV's build-time source fingerprint
    against the live listing and downgrades to the lazy plan with a
    machine-readable decline."""
    import os
    import shutil

    sfd = str(tmp_path / "sf")
    shutil.copytree("/root/testdata/sf0.001", sfd)  # mutable source copy
    ldir = str(tmp_path / "layout")
    # register the MVs only (no bucketed table copies): the lazy fallback
    # then reads the RAW mutated source, so the two plans are comparable
    L._build_agg_mvs(spark, sfd, ldir, idents={})
    g = _q65_graph(spark, sf=sfd)
    df = g.plan()
    assert g.explain.agg_mv != (), g.explain.agg_mv_declines
    served = sorted(df.collect())

    # mutate lineitem outside the refresh path: rewrite the source file
    # with doubled rows (different size -> different fingerprint,
    # different true aggregate)
    import pyarrow as pa
    import pyarrow.parquet as pq

    lipath = os.path.join(sfd, "lineitem.parquet")
    t = pq.read_table(lipath)
    pq.write_table(pa.concat_tables([t, t]), lipath)
    # in-place file mutation under a live session additionally needs
    # Spark's file-status cache and the session reader cache refreshed
    # (standard Spark operational contract; the MV guard is about the
    # PLANNER not serving stale partials, which needs no refresh — the
    # guard fires below, before any reader is consulted)
    spark.catalog.refreshByPath(lipath)
    from highs_duckdb_spark import session as _S

    _S._READER_CACHE.clear()

    g2 = _q65_graph(spark, sf=sfd)
    df2 = g2.plan()
    assert g2.explain.agg_mv == ()
    assert ("rev_by_nation_year", "stale_source") in g2.explain.agg_mv_declines
    # the lazy plan reads the MUTATED source — the duplicated rows change
    # the revenue, which is exactly what the stale MV would have missed
    lazy = sorted(df2.collect())
    assert lazy != served


def test_agg_mv_inert_without_layout(spark):
    """No layout attached → no MV in the catalog → the plan is exactly
    the round-7 plan (no declines, no substitution, no extra work)."""
    g = _q65_graph(spark)
    df = g.plan()
    assert g.explain.agg_mv == ()
    assert g.explain.agg_mv_declines == ()
    assert df.columns == ["n_name", "revenue_c"]


# --- round 8: joint-NDV pair statistics ---------------------------------------


def test_eager_agg_joint_ndv_gates_correlated_keys(spark, tmp_path, monkeypatch):
    """VERDICT r07 item 4: on CORRELATED pre-keys (flag functionally
    determined by the join key) the independence product over-estimates
    groups by the flag's full NDV (here 100×, saturating at rows →
    predicted reduction 1.0 → wrongly declines); the sampled JOINT
    distinct count reads the true grain and the rewrite fires. Both arms
    pinned: without the pair harvest the product declines, with it the
    pre-aggregate fires and matches the lazy result."""
    from highs_duckdb_spark.sources import stats as z

    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    sfd = str(tmp_path)
    (
        spark.range(0, 40_000)
        .select(
            (F.col("id") % 2000).alias("k"),
            ((F.col("id") % 2000) % 100).alias("flag"),
            (F.col("id") % 7).alias("v"),
        )
        .coalesce(1)
        .write.parquet(sfd + "/facttab.parquet")
    )
    (
        spark.range(0, 2000)
        .select(F.col("id").alias("k2"), (F.col("id") % 5).alias("grp"))
        .coalesce(1)
        .write.parquet(sfd + "/dimtab.parquet")
    )

    def build():
        g = cbo.JoinGraph(spark, sfd)
        g.fact(
            "facttab",
            spark.read.parquet(sfd + "/facttab.parquet"),
            # declared k-bucketing: pre_keys [k, flag] are storage-covered,
            # so the multi-key rewrite reaches the reduction gate
            part_keys=frozenset({"k"}),
        )
        g.fact("dimtab", spark.read.parquet(sfd + "/dimtab.parquet"))
        g.edge("facttab", "k", "dimtab", "k2")
        g.aggregate(("flag", "grp"), {"s": ("sum", "v")})
        return g

    # arm 1: no pair declared → independence product saturates → decline
    g = build()
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline.startswith("reduction:"), g.explain.eager_decline
    lazy_rows = sorted(df.collect())

    # arm 2: pair declared → joint NDV ≈ 2000 → reduction ~20 → fires
    # (fresh cache dir so arm 1's pair-less harvest isn't served back;
    # the repo-shared cache stays untouched)
    monkeypatch.setattr(z, "JOINT_NDV_PAIRS", [("k", "flag")])
    monkeypatch.setattr(
        z, "primary_sidecar_cache", lambda: str(tmp_path / "sidecars2")
    )
    z._SIDECAR_MEMO.clear()
    g2 = build()
    df2 = g2.plan()
    assert g2.explain.eager_agg == ("facttab", ("k", "flag")), g2.explain.eager_decline
    assert sorted(df2.collect()) == lazy_rows
    z._SIDECAR_MEMO.clear()


def test_joint_ndv_harvest_accuracy(tmp_path, monkeypatch):
    """The pair harvest (GEE over the same bounded sample) must read the
    true joint grain on correlated columns where the product is 100×
    off, and stay order-insensitive in the accessor."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from highs_duckdb_spark.sources import stats as z

    monkeypatch.setattr(z, "JOINT_NDV_PAIRS", [("a", "b")])
    vals_a = [i % 2000 for i in range(40_000)]
    pq.write_table(
        pa.table(
            {
                "a": pa.array(vals_a, pa.int64()),
                "b": pa.array([v % 100 for v in vals_a], pa.int64()),
            }
        ),
        str(tmp_path / "t.parquet"),
    )
    ndv = z.collect_ndv(str(tmp_path))
    joint = ndv["pairs"]["a,b"]["ndv"]
    assert joint == 2000.0  # sample covers the table → exact
    stats = {"ndv": ndv}
    assert z.column_pair_ndv(stats, "a", "b") == 2000.0
    assert z.column_pair_ndv(stats, "b", "a") == 2000.0
    assert z.column_pair_ndv(stats, "a", "nope") is None
    # product is 100× the joint — exactly the over-estimate the pair fixes
    prod = ndv["columns"]["a"]["ndv"] * ndv["columns"]["b"]["ndv"]
    assert prod / joint == pytest.approx(100.0, rel=0.05)


def test_agg_mv_serves_q7_q8_class(spark, layout_dir):
    """Round 8 widening: the SAME rev_by_nation_year MV serves the TPC-H
    Q7 (q101: ship-year derived key + bilateral nation filter above the
    aggregate) and Q8 (q102: order-year rollup under a region-filtered
    ratio) classes — registered queries, MV-fired vs MV-off rows equal."""
    import os as _os

    from highs_duckdb_spark.operators.registry import QUERIES
    from highs_duckdb_spark.plans.advisor import capture_workloads

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    for name in ("q101_volume_shipping", "q102_market_share"):
        with capture_workloads() as sink:
            df = QUERIES[name].builder(spark, SF)
        assert sink[0]["agg_mv"] is not None, (name, sink[0]["agg_mv_declines"])
        mv_rows = sorted(map(tuple, df.collect()))
        _os.environ["HDS_DISABLE_AGG_MV"] = "1"
        try:
            off_rows = sorted(
                map(tuple, QUERIES[name].builder(spark, SF).collect())
            )
        finally:
            del _os.environ["HDS_DISABLE_AGG_MV"]
        assert mv_rows == off_rows, name


def test_derived_key_on_carrier_declines_eager(spark, monkeypatch):
    """A derived group key whose source column lives on the eager
    carrier (year(l_shipdate) on lineitem) must decline the carrier —
    merging a join key's rows across years would be WRONG, and the
    machine-readable reason names the column."""
    monkeypatch.setattr(cbo, "EAGER_AGG_MIN_BYTES", 0)
    g = cbo.JoinGraph(spark, SF)
    g.fact("lineitem", load_table(spark, "lineitem", SF))
    g.fact("orders", load_table(spark, "orders", SF))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.aggregate(
        (("ship_year", ("year", "l_shipdate")),),
        {"q": ("sum", "l_quantity")},
    )
    df = g.plan()
    assert g.explain.eager_agg == ()
    assert g.explain.eager_decline.startswith("derived_key_on_carrier:lineitem")
    assert df.columns == ["ship_year", "q"]
    # and the lazy derived key computes (years present in the data)
    years = {r[0] for r in df.collect()}
    assert years and all(1990 < y < 2005 for y in years)
