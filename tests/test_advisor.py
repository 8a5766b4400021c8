"""Workload-driven projection advisor (plans/advisor.py): capture hook,
pure aggregation, and the planner's decline reasons feeding it.

Host DuckDB leaves materialization design to DBA tooling; this advisor is
that tool for the JoinGraph workload (VERDICT r06 'What's missing' item 2:
"there is no workload-driven projection advisor")."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from highs_duckdb_spark.plans import advisor, cbo
from highs_duckdb_spark.session import clear_table_overrides, load_table
from highs_duckdb_spark.sources import layout as L

SF = "/root/testdata/sf0.001"


@pytest.fixture
def layout_dir(spark):
    d = tempfile.mkdtemp(prefix="hds_advisor_test_")
    try:
        yield d
    finally:
        clear_table_overrides(spark)
        for table, _src, _b, _s in L._all_specs():
            spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(d, table)}")
        for name in L.JOIN_PROJECTION_SPECS:
            spark.sql(f"DROP TABLE IF EXISTS {L._table_ident(d, name)}")
        shutil.rmtree(d, ignore_errors=True)


# --- pure aggregation over synthetic records --------------------------------


def _fact(name, table=None, columns=None, sel=1.0, nbytes=1e6, rows=1000.0,
          stat_proxy=False):
    return {
        "name": name,
        "table": table or name,
        "sel": sel,
        "bytes": nbytes,
        "rows": rows,
        "columns": sorted(columns) if columns is not None else None,
        "stat_proxy": stat_proxy,
        "has_prepare": False,
    }


def _edge(a, ka, b, kb, extra=False):
    return {"a": a, "ka": ka, "b": b, "kb": kb, "extra": extra}


def test_pair_candidates_aggregates_columns_and_queries():
    recs = [
        {
            "query": "qA",
            "facts": [
                _fact("lineitem", columns={"l_qty"}, nbytes=8e6, rows=8000.0),
                _fact("orders", columns={"o_date"}, nbytes=2e6, rows=2000.0),
            ],
            "edges": [_edge("lineitem", "l_ok", "orders", "o_ok")],
            "dims": [],
        },
        {
            "query": "qB",
            "facts": [
                _fact("lineitem", columns={"l_price"}, nbytes=8e6, rows=8000.0),
                _fact("orders", columns={"o_cust"}, nbytes=2e6, rows=2000.0),
                _fact("customer", columns={"c_name"}, nbytes=1e6, rows=500.0),
            ],
            "edges": [
                _edge("lineitem", "l_ok", "orders", "o_ok"),
                _edge("orders", "o_cust", "customer", "c_cust"),
            ],
            "dims": [],
        },
    ]
    pairs = advisor.pair_candidates(recs)
    li_or = next(p for p in pairs if set(p["tables"]) == {"lineitem", "orders"})
    assert li_or["n_queries"] == 2
    # column need = declared columns + incident edge keys, unioned per table
    assert set(li_or["columns"]["lineitem"]) == {"l_qty", "l_price", "l_ok"}
    assert set(li_or["columns"]["orders"]) == {"o_date", "o_cust", "o_ok"}
    # downstream clustering candidate: the external edge key (o_cust in qB)
    assert li_or["bucket_cols"] == ["o_cust"]
    # the orders-customer pair exists too, from qB alone
    or_cu = next(p for p in pairs if set(p["tables"]) == {"customer", "orders"})
    assert or_cu["n_queries"] == 1


def test_pair_candidates_skips_unmatchable_class():
    base = {
        "query": "q",
        "dims": [],
        "edges": [_edge("a", "k", "b", "k2")],
    }
    no_optin = dict(base, facts=[_fact("a"), _fact("b", columns={"x"})])
    proxy = dict(
        base,
        facts=[_fact("a", columns={"x"}, stat_proxy=True), _fact("b", columns={"y"})],
    )
    extra = dict(
        base,
        facts=[_fact("a", columns={"x"}), _fact("b", columns={"y"})],
        edges=[_edge("a", "k", "b", "k2", extra=True)],
    )
    served = dict(
        base,
        facts=[_fact("a", columns={"x"}), _fact("b", columns={"y"})],
        projections=[["p", ["a", "b"]]],
    )
    assert advisor.pair_candidates([no_optin, proxy, extra, served]) == []


def test_spec_coverage_reads_planner_records():
    recs = [
        {
            "query": "q_served",
            "facts": [],
            "edges": [],
            "dims": [],
            "projections": [["lineitem_orders", ["lineitem", "orders"]]],
            "declines": [],
        },
        {
            "query": "q_declined",
            "facts": [],
            "edges": [],
            "dims": [],
            "projections": [],
            "declines": [["lineitem_orders", "missing_columns:l_partkey,l_quantity"]],
        },
        {
            "query": "q_guard",
            "facts": [],
            "edges": [],
            "dims": [],
            "projections": [],
            "declines": [["lineitem_orders", "no_columns_optin:lineitem"]],
        },
    ]
    cov = advisor.spec_coverage(recs)
    e = cov["lineitem_orders"]
    assert [q for q, _ in e["served"]] == ["q_served"]
    assert {q for q, _ in e["declined"]} == {"q_declined", "q_guard"}
    assert e["widen_columns"] == ["l_partkey", "l_quantity"]
    # the report renders without error and names the widening
    md = advisor.render_markdown([], cov)
    assert "l_partkey, l_quantity" in md


# --- capture hook against the real planner ----------------------------------


def test_capture_records_real_graph(spark):
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    with advisor.capture_workloads() as sink:
        g = cbo.JoinGraph(spark, SF)
        g.fact("orders", orders, columns=("o_orderdate",), sel=0.5)
        g.fact("customer", cust, columns=("c_name",))
        g.edge("orders", "o_custkey", "customer", "c_custkey")
        g.plan()
    assert cbo._WORKLOAD_SINK is None  # hook restored
    (rec,) = sink
    assert {f["name"] for f in rec["facts"]} == {"orders", "customer"}
    f_orders = next(f for f in rec["facts"] if f["name"] == "orders")
    assert f_orders["sel"] == 0.5 and f_orders["columns"] == ["o_orderdate"]
    assert rec["edges"] == [
        {"a": "orders", "ka": "o_custkey", "b": "customer", "kb": "c_custkey",
         "extra": False}
    ]
    assert rec["projections"] == [] and rec["declines"] == []


def test_planner_decline_reasons_surface_in_capture(spark, layout_dir):
    """Under the attached layout the capture carries BOTH planner
    outcomes: q103/q104 record their lineitem_orders substitution (served
    by the advisor-widened columns), and a graph touching a column
    genuinely outside the projection (l_tax) records the machine-readable
    missing_columns decline the advisor turns into the NEXT widening."""
    from highs_duckdb_spark.operators import QUERIES

    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    with advisor.capture_workloads() as sink:
        QUERIES["q103_product_profit"].builder(spark, SF)
        QUERIES["q104_returned_items"].builder(spark, SF)
        g = cbo.JoinGraph(spark, SF)
        g.fact("lineitem", load_table(spark, "lineitem", SF), columns=("l_tax",))
        g.fact("orders", load_table(spark, "orders", SF), columns=("o_orderdate",))
        g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
        g.plan()
    for rec, q in zip(sink, ("q103_product_profit", "q104_returned_items", "q_tax")):
        rec["query"] = q
    cov = advisor.spec_coverage(sink)
    e = cov["lineitem_orders"]
    assert {q for q, _ in e["served"]} == {
        "q103_product_profit",
        "q104_returned_items",
    }
    declined = dict(e["declined"])
    assert declined["q_tax"] == "missing_columns:l_tax"
    assert e["widen_columns"] == ["l_tax"]


# --- round 8: aggregate-MV and chain candidates -------------------------------


def test_agg_mv_candidate_derived_from_capture(spark):
    """VERDICT r07 item 6 'done' criterion: the advisor proposes the q65
    aggregate MV from capture alone — no layout attached, purely from the
    declared aggregate, structural dims, and the semantic range filter.
    The proposal's grain must include the local-supplier equality keys
    and the derived year column, with a grain-rows estimate orders of
    magnitude below the fact rows."""
    recs = advisor.capture_registry(
        spark, SF, names=["q65_tpch_q5_local_volume"]
    )
    mvs = advisor.agg_mv_candidates(recs, SF)
    assert len(mvs) == 1
    c = mvs[0]
    assert c["tables"] == ["customer", "lineitem", "orders"]
    assert set(c["dim_tables"]) == {"nation", "supplier"}
    assert {"c_nationkey", "s_nationkey", "year(o_orderdate)"} <= set(
        c["group_keys"]
    )
    assert c["queries"] == ["q65_tpch_q5_local_volume"]
    assert c["grain_rows"] is not None
    # fact rows at sf0.001: lineitem ~6k; the grain estimate must be a
    # NDV-product of dimension attributes, not a fact-grain number
    assert c["grain_rows"] <= 25 * 25 * 25 * 10


def test_agg_mv_candidate_excluded_when_served(spark, layout_dir):
    """A query the planner already serves from an attached MV must NOT be
    re-proposed (the candidate list is the un-served residual)."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    recs = advisor.capture_registry(
        spark, SF, names=["q65_tpch_q5_local_volume"]
    )
    assert recs[0]["agg_mv"] is not None  # sanity: the MV fired
    assert advisor.agg_mv_candidates(recs, SF) == []


def test_chain_candidates_from_capture(spark):
    """The chain generator surfaces q65's fully-opted-in fact triple
    (customer–orders–lineitem through the orders middle) with both join
    key pairs; below the recurrence floor it is dropped."""
    recs = advisor.capture_registry(
        spark, SF, names=["q65_tpch_q5_local_volume"]
    )
    chains = advisor.chain_candidates(recs, min_queries=1)
    assert len(chains) == 1
    c = chains[0]
    assert c["tables"] == ["customer", "lineitem", "orders"]
    assert [sorted(j) for j in c["joins"]] == [
        ["c_custkey", "o_custkey"],
        ["l_orderkey", "o_orderkey"],
    ]
    # a single-query chain is below the default floor
    assert advisor.chain_candidates(recs) == []


def test_mv_served_records_excluded_from_all_candidates(spark, layout_dir):
    """An MV-served query absorbs nothing — it must not feed PAIR or
    CHAIN candidates either (round 8: with the layout attached the
    Q5/Q7/Q8 class rode the MV yet still generated a chain proposal for
    its own — already served — triple)."""
    L.attach_bucketed(spark, SF, layout_dir, buckets=4)
    recs = advisor.capture_registry(
        spark, SF,
        names=["q65_tpch_q5_local_volume", "q101_volume_shipping",
               "q102_market_share"],
    )
    assert all(r["agg_mv"] is not None for r in recs)
    assert advisor.chain_candidates(recs, min_queries=1) == []
    assert advisor.pair_candidates(recs) == []
    assert advisor.agg_mv_candidates(recs, SF) == []


# --- round 9: top-k clustered-copy candidates (VERDICT r08 item 3) ----------


def test_topk_capture_and_candidates(spark, tmp_path, monkeypatch):
    """topk_scan declares every ORDER-BY/LIMIT plan to the workload sink
    (kind="topk"); the advisor ranks an UNSERVED (table, column,
    direction) as a value-clustered-copy candidate, and the join-graph
    candidate functions skip the scan records without tripping."""
    from highs_duckdb_spark.operators import QUERIES

    # empty layout dir: the ambient benchdata layout must not mark the
    # declaration as already served
    monkeypatch.setattr(L, "default_layout_dir", lambda sf: str(tmp_path))
    with advisor.capture_workloads() as sink:
        QUERIES["q42_topk"].builder(spark, SF)
    recs = [dict(r, query="q42_topk") for r in sink]
    tk = [r for r in recs if r.get("kind") == "topk"]
    assert len(tk) == 1
    assert (tk[0]["table"], tk[0]["column"], tk[0]["descending"]) == (
        "orders", "o_totalprice", True,
    )
    cands = advisor.topk_copy_candidates(recs)
    assert len(cands) == 1 and cands[0]["n_queries"] == 1
    assert cands[0]["absorbed_bytes"] > 0
    # join-graph candidate fns must tolerate scan records in the stream
    assert advisor.pair_candidates(recs) == []
    assert advisor.chain_candidates(recs) == []
    assert advisor.agg_mv_candidates(recs) == []
    md = advisor.render_markdown(
        [], {}, topk_copies=cands
    )
    assert "Value-clustered copy candidates" in md


def test_value_clustered_copy_serves_topk(spark, tmp_path, monkeypatch):
    """The advisor-proposed copy end-to-end on the GENERIC path (a
    non-orders table): build_value_clustered, then topk_scan serves the
    pruned scan from the copy's zone sidecar with a pushable threshold,
    and the top-k result is identical to the plain path's."""
    monkeypatch.setattr(L, "default_layout_dir", lambda sf: str(tmp_path))
    path = L.build_value_clustered(spark, SF, "customer", "c_acctbal")
    assert L.clustered_copy_path(SF, "customer", "c_acctbal") == path

    df, t = L.topk_scan(spark, SF, "customer", "c_acctbal", 10)
    assert t is not None
    assert all(str(tmp_path) in f for f in df.inputFiles())
    got = (
        df.filter(F.col("c_acctbal") >= F.lit(t))
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    monkeypatch.setenv("HDS_DISABLE_TOPK_COPY", "1")
    plain, t2 = L.topk_scan(spark, SF, "customer", "c_acctbal", 10)
    if t2 is not None:
        plain = plain.filter(F.col("c_acctbal") >= F.lit(t2))
    want = (
        plain.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    assert got == want and len(got) == 10


def test_q42_topk_uses_built_copy(spark, tmp_path, monkeypatch):
    """With the (advisor-proposed) orders copy built, the PLAIN q42_topk
    entry serves from it — files pruned to the copy — and hash-equals the
    no-copy run (the graded no-layout path stays the reference)."""
    from highs_duckdb_spark.operators import QUERIES

    monkeypatch.setattr(L, "default_layout_dir", lambda sf: str(tmp_path))
    L.build_value_clustered(spark, SF, "orders", "o_totalprice")
    df = QUERIES["q42_topk"].builder(spark, SF)
    assert all(str(tmp_path) in f for f in df.inputFiles())
    got = df.collect()
    monkeypatch.setenv("HDS_DISABLE_TOPK_COPY", "1")
    want = QUERIES["q42_topk"].builder(spark, SF).collect()
    assert got == want

# --- round 10: q102-shaped candidate fidelity pin (VERDICT r09 item 8) ------


def test_q102_capture_proposes_mutually_consistent_spec(spark):
    """ADVICE r08 follow-through: the q102 (TPC-H Q8 market-share) capture
    is the shape that used to propose inconsistent specs — supplier's
    nation (n1), the customer nation (n2), and region chained off n2 are
    all non-catalog-rows dims, so they are EXCLUDED from the candidate,
    yet their joins were still emitted. Pin the exact shape: the proposal
    must name only {customer, lineitem, orders} + supplier, every join
    column must belong to an INCLUDED relation, and each excluded dim must
    survive re-joinably via its tree-side key in the group grain (the FK
    that functionally determines the dim's output columns)."""
    recs = advisor.capture_registry(spark, SF, names=["q102_market_share"])
    mvs = advisor.agg_mv_candidates(recs, SF)
    assert len(mvs) == 1
    c = mvs[0]
    assert c["tables"] == ["customer", "lineitem", "orders"]
    assert c["dim_tables"] == ["supplier"]
    # ADVICE r08 fix pin: join columns reference only included relations
    # (TPC-H prefix convention maps columns to owners)
    owners = {
        "l_": "lineitem", "o_": "orders", "c_": "customer",
        "s_": "supplier", "n_": "nation", "r_": "region",
        "p_": "part",
    }
    included = set(c["tables"]) | set(c["dim_tables"])
    for a, b in c["joins"]:
        for col in (a, b):
            owner = next(
                (t for p, t in owners.items() if col.startswith(p)), None
            )
            assert owner in included, (col, c["joins"])
    assert [sorted(j) for j in c["joins"]] == [
        ["c_custkey", "o_custkey"],
        ["l_orderkey", "o_orderkey"],
        ["l_suppkey", "s_suppkey"],
    ]
    # excluded dims re-join above the MV through their surviving
    # tree-side keys: n1 via s_nationkey, n2 via c_nationkey
    assert {"c_nationkey", "s_nationkey"} <= set(c["group_keys"])
    # and no raw column OF an excluded dim leaks into grain or joins
    flat = {col for j in c["joins"] for col in j} | set(c["group_keys"])
    assert not any(col.startswith(("n_", "r_")) for col in flat), flat
