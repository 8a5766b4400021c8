"""Distributed-path consistency at modest fan-out: 200 randomly generated
LPs solved through the executor-side bulk path must match the driver-side
solver exactly (same module, but exercised through Arrow/pandas grouping,
name-sorted ordering, and the shuffle)."""

from __future__ import annotations

import random

import pytest

from highs_duckdb_spark.optim.bulk import solve_many
from highs_duckdb_spark.optim.simplex import solve_lp

N_MODELS = 200


def _gen_models():
    rnd = random.Random(42)
    models = {}
    for i in range(N_MODELS):
        n = rnd.randint(2, 4)
        c = [round(rnd.uniform(-5, 5), 2) for _ in range(n)]
        ub = [round(rnd.uniform(1, 10), 2) for _ in range(n)]
        a = [round(rnd.uniform(0, 3), 2) for _ in range(n)]
        cap = round(rnd.uniform(1, 15), 2)
        models[f"m{i:03d}"] = (c, ub, a, cap)
    return models


def test_bulk_matches_driver_solver(spark):
    models = _gen_models()
    vrows, crows, krows = [], [], []
    for name, (c, ub, a, cap) in models.items():
        for j, (cj, ubj) in enumerate(zip(c, ub)):
            vrows.append((name, f"v{j}", 0.0, ubj, cj, "continuous", j))
            krows.append((name, "cap", f"v{j}", a[j]))
        crows.append((name, "cap", -1e30, cap, 0))
    v = spark.createDataFrame(
        vrows,
        "model_name string, variable_name string, lower_bound double, upper_bound double, "
        "obj_coefficient double, var_type string, ord long",
    )
    con = spark.createDataFrame(
        crows,
        "model_name string, constraint_name string, lower_bound double, upper_bound double, ord long",
    )
    k = spark.createDataFrame(
        krows, "model_name string, constraint_name string, variable_name string, coefficient double"
    )
    rows = solve_many(v, con, k).collect()
    by_model: dict[str, dict[str, tuple[float, float, str]]] = {}
    for r in rows:
        by_model.setdefault(r["model_name"], {})[r["variable_name"]] = (
            r["solution_value"],
            r["reduced_cost"],
            r["status"],
        )
    assert len(by_model) == N_MODELS
    for name, (c, ub, a, cap) in models.items():
        n = len(c)
        ref = solve_lp(c, [a], [-1e30], [cap], [0.0] * n, ub)
        got = by_model[name]
        assert len(got) == n, name
        for j in range(n):
            sol, rc, status = got[f"v{j}"]
            assert status == ref.status, name
            assert sol == pytest.approx(ref.x[j], abs=1e-8), (name, j)
            assert rc == pytest.approx(ref.reduced_costs[j], abs=1e-8), (name, j)
