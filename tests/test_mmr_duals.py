"""Property tests for s09 (MMR diversified retrieval) and the
constraint-dual (shadow price) solver surface."""

from __future__ import annotations

import numpy as np

from highs_duckdb_spark.operators.registry import QUERIES
from highs_duckdb_spark.optim.registry import (
    ModelRegistry,
    create_constraints,
    create_variables,
    set_coefficients,
    solve_duals,
)

SF_DIR = "/root/testdata/sf0.001"


def _load_vecs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    V = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    return dict(zip(ids, V))


def _avg_pairwise_cos(vecs, ids):
    M = np.vstack([vecs[i] for i in ids])
    S = M @ M.T
    n = len(ids)
    return (S.sum() - np.trace(S)) / (n * (n - 1))


def test_mmr_is_more_diverse_than_plain_topk(spark):
    """Averaged over queries, the MMR pick set must have lower intra-set
    cosine similarity than the plain top-5 (that's the point of MMR)."""
    vecs = _load_vecs()
    mmr = QUERIES["s09_mmr_diversified_topk"].builder(spark, SF_DIR).collect()
    plain = QUERIES["s01_cosine_topk"].builder(spark, SF_DIR).collect()
    by_q_mmr: dict[int, list[int]] = {}
    for r in mmr:
        by_q_mmr.setdefault(r.query_id, []).append(r.neighbor_id)
    by_q_plain: dict[int, list[int]] = {}
    for r in plain:
        by_q_plain.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(by_q_mmr) == set(by_q_plain)
    d_mmr = np.mean([_avg_pairwise_cos(vecs, ids) for ids in by_q_mmr.values()])
    d_plain = np.mean([_avg_pairwise_cos(vecs, ids) for ids in by_q_plain.values()])
    assert d_mmr < d_plain
    # and at least one query must actually have diverged from plain top-k
    assert any(
        set(by_q_mmr[q]) != set(by_q_plain[q]) for q in by_q_mmr
    ), "MMR never changed a pick set — lambda trade-off is inert"


def test_mmr_first_pick_is_top1(spark):
    mmr = QUERIES["s09_mmr_diversified_topk"].builder(spark, SF_DIR).collect()
    plain = QUERIES["s01_cosine_topk"].builder(spark, SF_DIR).collect()
    top1 = {r.query_id: r.neighbor_id for r in plain if r.rk == 1}
    for r in mmr:
        if r.pick == 1:
            assert r.neighbor_id == top1[r.query_id]


def _fresh(spark, name):
    ModelRegistry.instance().remove_model(name)
    return name


def test_duals_missing_model_error_row(spark):
    ModelRegistry.instance().remove_model("nope_duals")
    rows = solve_duals(spark, "nope_duals").collect()
    assert len(rows) == 1
    assert rows[0].status.startswith("ERROR: Model 'nope_duals' not found")


def test_duals_zero_when_constraints_slack(spark):
    """Golden reference LP: both rows slack at the optimum → duals 0."""
    name = _fresh(spark, "t_duals_slack")
    create_variables(spark, name, "x", 0.0, 1e30, 1.0, "continuous")
    create_variables(spark, name, "y", 1.0, 1e30, 1.0, "continuous")
    create_constraints(spark, name, "c1", -1e30, 7.0)
    create_constraints(spark, name, "c2", -1e30, 9.0)
    set_coefficients(spark, name, "c1", "x", 1.0)
    set_coefficients(spark, name, "c1", "y", 2.0)
    set_coefficients(spark, name, "c2", "x", 3.0)
    set_coefficients(spark, name, "c2", "y", 1.0)
    rows = solve_duals(spark, name).collect()
    assert [r.constraint_name for r in rows] == ["c1", "c2"]
    assert all(r.status == "Optimal" for r in rows)
    assert [r.dual for r in rows] == [0.0, 0.0]
    assert [r.activity for r in rows] == [2.0, 1.0]  # x=0, y=1


def test_duals_zero_for_milp(spark):
    name = _fresh(spark, "t_duals_milp")
    create_variables(spark, name, "x", 0.0, 10.0, -1.0, "integer")
    create_constraints(spark, name, "c1", -1e30, 3.5)
    set_coefficients(spark, name, "c1", "x", 1.0)
    rows = solve_duals(spark, name).collect()
    assert rows[0].status == "Optimal"
    assert rows[0].dual == 0.0
    assert rows[0].activity == 3.0  # x = 3 (integer-feasible optimum)


def test_duals_sensitivity_interpretation(spark):
    """dual = ∂obj/∂rhs: bumping the binding rhs by 1 must move the
    objective by exactly the reported dual (LP is linear in the rhs)."""
    from highs_duckdb_spark.optim.registry import solve

    def build(cap):
        name = _fresh(spark, "t_duals_sens")
        create_variables(spark, name, "x", 0.0, 1e30, -10.0, "continuous")
        create_variables(spark, name, "y", 0.0, 1e30, -6.0, "continuous")
        create_constraints(spark, name, "capacity", -1e30, cap)
        create_constraints(spark, name, "labor", -1e30, 150.0)
        set_coefficients(spark, name, "capacity", "x", 1.0)
        set_coefficients(spark, name, "capacity", "y", 1.0)
        set_coefficients(spark, name, "labor", "x", 2.0)
        set_coefficients(spark, name, "labor", "y", 1.0)
        return name

    name = build(100.0)
    duals = {r.constraint_name: r.dual for r in solve_duals(spark, name).collect()}
    obj0 = sum(
        r.solution_value * c
        for r, c in zip(solve(spark, name).collect(), (-10.0, -6.0))
    )
    name = build(101.0)
    obj1 = sum(
        r.solution_value * c
        for r, c in zip(solve(spark, name).collect(), (-10.0, -6.0))
    )
    assert abs((obj1 - obj0) - duals["capacity"]) < 1e-9
