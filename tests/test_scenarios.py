"""Integration tests replaying the reference's two example scenarios
end-to-end (solver + relational post-analysis)."""

from __future__ import annotations

import pytest

from highs_duckdb_spark.operators.optimization import (
    opt03_network_flow_total_cost,
    opt04_datacenter_mip,
)
from highs_duckdb_spark.optim.scenarios import (
    ASSIGNMENT_COSTS,
    NETWORK_FLOW_CONSTRAINTS,
    solve_datacenter,
    solve_network_flow,
)

SF = "/root/testdata/sf0.001"


def test_network_flow_optimal_cost(spark):
    """Min-cost-flow assignment: optimum 250 (matches the OR-Tools example
    this scenario derives from; reference: network_flow_example.sql)."""
    rows = {r["variable_name"]: r for r in solve_network_flow(spark).collect()}
    assert all(r["status"] == "Optimal" for r in rows.values())
    total = sum(ASSIGNMENT_COSTS.get(n, 0) * r["solution_value"] for n, r in rows.items())
    assert total == pytest.approx(250.0, abs=1e-6)


def test_network_flow_conservation(spark):
    """Every flow-conservation constraint holds on the returned solution."""
    sol = {r["variable_name"]: r["solution_value"] for r in solve_network_flow(spark).collect()}
    for cname, lb, ub, coeffs in NETWORK_FLOW_CONSTRAINTS:
        lhs = sum(c * sol[v] for v, c in coeffs.items())
        if lb > -1e29:
            assert lhs >= lb - 1e-6, cname
        if ub < 1e29:
            assert lhs <= ub + 1e-6, cname


def test_network_flow_post_analysis_query(spark):
    df = opt03_network_flow_total_cost(spark, SF)
    assert df.collect()[0]["result"] == "Total cost = 250"


def test_datacenter_mip_unique_optimum(spark):
    """15-binary-var site selection: unique optimum (brute-force verified):
    build DC1+DC3, D1/D2→DC1, D3/D4→DC3, total cost 260."""
    rows = {r["variable_name"]: r["solution_value"] for r in solve_datacenter(spark).collect()}
    expected_ones = {"x_DC1_D1", "x_DC1_D2", "x_DC3_D3", "x_DC3_D4", "z_DC1", "z_DC3"}
    for name, val in rows.items():
        assert val == pytest.approx(1.0 if name in expected_ones else 0.0, abs=1e-6), name


def test_datacenter_query_entry(spark):
    df = opt04_datacenter_mip(spark, SF)
    got = {r["variable_name"]: r["solution_value"] for r in df.collect()}
    assert got["z_DC2"] == 0.0 and got["z_DC1"] == 1.0 and got["z_DC3"] == 1.0
