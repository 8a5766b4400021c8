"""Registry + 6-function API contract tests, replicating the reference's
committed sqllogictest goldens (reference: test/sql/highs.test) and the
semantic gotchas in SURVEY.md §2.1."""

from __future__ import annotations

import pytest

from highs_duckdb_spark.optim import (
    ModelRegistry,
    create_constraints,
    create_variables,
    highs_openssl_version,
    highs_version,
    set_coefficients,
    solve,
)


@pytest.fixture(autouse=True)
def clean_registry():
    yield
    ModelRegistry.instance().clear()


def build_golden_model(spark, name="model1"):
    # reference: test/sql/highs.test:31-51
    create_variables(spark, name, "x", 0.0, 1e30, 1.0, "continuous")
    create_variables(spark, name, "y", 1.0, 1e30, 1.0, "continuous")
    create_constraints(spark, name, "c1", -1e30, 7.0)
    create_constraints(spark, name, "c2", -1e30, 9.0)
    set_coefficients(spark, name, "c1", "x", 1.0)
    set_coefficients(spark, name, "c1", "y", 2.0)
    set_coefficients(spark, name, "c2", "x", 3.0)
    set_coefficients(spark, name, "c2", "y", 1.0)


def test_golden_flow(spark):
    build_golden_model(spark)
    rows = [tuple(r) for r in solve(spark, "model1").collect()]
    # reference: test/sql/highs.test:94-98
    assert rows == [
        ("x", "x_0", 0.0, 1.0, "Optimal"),
        ("y", "y_1", 1.0, 1.0, "Optimal"),
    ]


def test_create_variables_output_schema(spark):
    df = create_variables(spark, "m", "v1", 0.0, 1.0, 2.0, "continuous")
    assert df.columns == ["variable_name", "variable_index", "status"]
    row = df.collect()[0]
    assert tuple(row) == ("v1", "v1_0", "SUCCESS")


def test_duplicate_variable_error_row(spark):
    create_variables(spark, "m", "v1", 0.0, 1.0, 2.0, "continuous")
    row = create_variables(spark, "m", "v1", 0.0, 1.0, 2.0, "continuous").collect()[0]
    # reference: src/highs_extension.cpp:177-182, 211-224
    assert row["variable_index"] == "ERROR"
    assert row["status"] == "ERROR: Variable 'v1' already exists in model 'm'"


def test_duplicate_constraint_error_row(spark):
    create_constraints(spark, "m", "c1", 0.0, 1.0)
    row = create_constraints(spark, "m", "c1", 0.0, 1.0).collect()[0]
    assert row["constraint_index"] == "ERROR"
    assert row["status"] == "ERROR: Constraint 'c1' already exists in model 'm'"


def test_set_coefficients_missing_model(spark):
    row = set_coefficients(spark, "ghost_model", "c", "v", 1.0).collect()[0]
    # reference: src/highs_extension.cpp:391-411 — reported without touching registry
    assert row["status"] == "ERROR: Model 'ghost_model' not found"
    assert ModelRegistry.instance().get_model("ghost_model") is None


def test_set_coefficients_missing_var_and_constraint(spark):
    create_variables(spark, "m", "v1", 0.0, 1.0, 1.0, "continuous")
    create_constraints(spark, "m", "c1", 0.0, 1.0)
    r1 = set_coefficients(spark, "m", "c1", "nope", 1.0).collect()[0]
    assert r1["status"] == "ERROR: Variable 'nope' not found in model 'm'"
    r2 = set_coefficients(spark, "m", "nope", "v1", 1.0).collect()[0]
    assert r2["status"] == "ERROR: Constraint 'nope' not found in model 'm'"


def test_solve_missing_model_row(spark):
    row = solve(spark, "nope").collect()[0]
    # reference: src/highs_extension.cpp:520-538
    assert tuple(row) == ("N/A", "ERROR", 0.0, 0.0, "ERROR: Model 'nope' not found")


def test_binary_clamps_bounds(spark):
    # declared bounds wider than [0,1]; binary clamps (reference: :577-584)
    create_variables(spark, "mb", "b1", -5.0, 10.0, -1.0, "binary")
    rows = solve(spark, "mb").collect()
    assert rows[0]["solution_value"] == pytest.approx(1.0)  # min -b1 → b1=1, not 10


def test_solution_insertion_order(spark):
    for name in ["zeta", "alpha", "mid"]:
        create_variables(spark, "mo", name, 0.0, 1.0, 1.0, "continuous")
    rows = solve(spark, "mo").collect()
    assert [r["variable_name"] for r in rows] == ["zeta", "alpha", "mid"]
    assert [r["variable_index"] for r in rows] == ["zeta_0", "alpha_1", "mid_2"]


def test_resolve_reflects_mutations(spark):
    """Each solve() call re-solves against current registry state
    (reference: per-scan state, src/highs_extension.cpp:719-722)."""
    create_variables(spark, "mr", "x", 0.0, 10.0, 1.0, "continuous")
    assert solve(spark, "mr").collect()[0]["solution_value"] == pytest.approx(0.0)
    create_constraints(spark, "mr", "floor", 3.0, 1e30)
    set_coefficients(spark, "mr", "floor", "x", 1.0)
    assert solve(spark, "mr").collect()[0]["solution_value"] == pytest.approx(3.0)


def test_duplicate_coefficients_sum(spark):
    # appending the same (c,v) twice: both entries land in the matrix
    create_variables(spark, "md", "x", 0.0, 10.0, -1.0, "continuous")
    create_constraints(spark, "md", "cap", -1e30, 6.0)
    set_coefficients(spark, "md", "cap", "x", 1.0)
    set_coefficients(spark, "md", "cap", "x", 2.0)  # net coefficient 3
    assert solve(spark, "md").collect()[0]["solution_value"] == pytest.approx(2.0)


def test_version_strings(spark):
    assert highs_version("World").startswith("Hello World, HiGHS version:")
    assert "OpenSSL" in highs_openssl_version("X")
