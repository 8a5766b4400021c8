"""Named LP/MIP model registry + the reference extension's 6 SQL functions.

Mirrors the reference's process-global, mutex-guarded registry
(reference: src/highs_extension.cpp:26-76) and its function surface
(reference: src/highs_extension.cpp:725-776) with the same semantics:

- errors are **data**, not exceptions: every function returns a 1-row
  DataFrame whose ``status`` column carries ``SUCCESS`` or
  ``ERROR: <message>`` (reference: src/highs_extension.cpp:211-224);
- ``variable_index`` / ``constraint_index`` are the strings
  ``"{name}_{idx}"`` with insertion-order indices (reference:
  src/highs_extension.cpp:203-208);
- duplicate coefficient entries append (no dedup; reference:
  src/highs_extension.cpp:434-436) and are summed at matrix build —
  the same net matrix HiGHS assembles;
- ``solve`` re-solves on every call (per-scan state in the reference:
  src/highs_extension.cpp:719-722) and emits one row per variable in
  insertion order, with ``binary`` bounds clamped to [0,1]
  (reference: src/highs_extension.cpp:574-584).

Spark-design note: models here are KB-scale (≤34 vars in the reference's
own examples) so mutation happens on the driver under a ``threading.Lock``,
exactly paralleling the reference's single-process mutex. The scale path —
thousands of models defined relationally as DataFrames — lives in
:mod:`highs_duckdb_spark.optim.bulk` and runs each solve as a grouped-map
pandas-UDF task on executors.
"""

from __future__ import annotations

import ssl
import threading
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.optim.simplex import solve_lp, solve_milp
from highs_duckdb_spark.session import local_rows_df

#: Version string for the embedded solver. The reference reports the HiGHS
#: library version (reference: src/highs_extension.cpp:117-126); ours is the
#: version of this package's built-in simplex implementation.
SOLVER_VERSION = "1.7.2-pysimplex"

VARIABLE_RESULT_SCHEMA = "variable_name string, variable_index string, status string"
CONSTRAINT_RESULT_SCHEMA = "constraint_name string, constraint_index string, status string"
COEFFICIENT_RESULT_SCHEMA = (
    "constraint_name string, variable_name string, coefficient double, status string"
)
SOLVE_RESULT_SCHEMA = (
    "variable_name string, variable_index string, solution_value double, "
    "reduced_cost double, status string"
)


@dataclass
class HighsModelInfo:
    """Per-model mutable state (reference: src/highs_extension.cpp:26-44)."""

    variable_indices: dict[str, int] = field(default_factory=dict)
    constraint_indices: dict[str, int] = field(default_factory=dict)
    variable_names: list[str] = field(default_factory=list)
    constraint_names: list[str] = field(default_factory=list)
    obj_coefficients: list[float] = field(default_factory=list)
    var_lower_bounds: list[float] = field(default_factory=list)
    var_upper_bounds: list[float] = field(default_factory=list)
    constraint_lower_bounds: list[float] = field(default_factory=list)
    constraint_upper_bounds: list[float] = field(default_factory=list)
    #: COO-by-row: constraint_coefficients[row] = [(var_idx, coeff), ...]
    constraint_coefficients: dict[int, list[tuple[int, float]]] = field(default_factory=dict)
    variable_types: list[str] = field(default_factory=list)
    next_var_index: int = 0
    next_constraint_index: int = 0
    # objective sense is hard-coded to minimize (reference: src/highs_extension.cpp:43)


class ModelRegistry:
    """Process-wide singleton registry (reference: src/highs_extension.cpp:46-76)."""

    _instance: "ModelRegistry | None" = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._models: dict[str, HighsModelInfo] = {}
        self._lock = threading.Lock()

    @classmethod
    def instance(cls) -> "ModelRegistry":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @property
    def mutation_lock(self) -> threading.Lock:
        """Held by the API functions across check-and-mutate sequences —
        the analogue of the reference holding its registry mutex for the
        whole table-function body (reference: src/highs_extension.cpp:58)."""
        return self._lock

    def get_or_create_model(self, name: str) -> HighsModelInfo:
        # callers must hold mutation_lock (re-entrancy not required: the dict
        # op itself is atomic under the GIL; the lock protects the larger
        # check-and-mutate sequences in the API functions)
        return self._models.setdefault(name, HighsModelInfo())

    def get_model(self, name: str) -> HighsModelInfo | None:
        return self._models.get(name)

    def remove_model(self, name: str) -> bool:
        # Exists for API parity; the reference never exposes it as SQL
        # (reference: src/highs_extension.cpp:72-75). Useful for test isolation.
        with self._lock:
            return self._models.pop(name, None) is not None

    def clear(self) -> None:
        with self._lock:
            self._models.clear()


def highs_version(name: str) -> str:
    """Scalar: greeting + solver version (reference: src/highs_extension.cpp:117-126)."""
    return f"Hello {name}, HiGHS version: {SOLVER_VERSION}"


def highs_openssl_version(name: str) -> str:
    """Scalar: greeting + OpenSSL version (reference: src/highs_extension.cpp:128-139)."""
    return f"Hello {name}, the HiGHS extension is running with OpenSSL version: {ssl.OPENSSL_VERSION}"


def create_variables(
    spark: SparkSession,
    model_name: str,
    variable_name: str,
    lower_bound: float,
    upper_bound: float,
    obj_coefficient: float,
    var_type: str,
) -> DataFrame:
    """Add a variable; returns the 1-row status DataFrame
    (reference: src/highs_extension.cpp:157-263)."""
    registry = ModelRegistry.instance()
    with registry.mutation_lock:
        model = registry.get_or_create_model(model_name)
        if variable_name in model.variable_indices:
            msg = f"Variable '{variable_name}' already exists in model '{model_name}'"
            row = (variable_name, "ERROR", f"ERROR: {msg}")
        else:
            var_index = model.next_var_index
            model.next_var_index += 1
            model.variable_indices[variable_name] = var_index
            model.variable_names.append(variable_name)
            model.obj_coefficients.append(float(obj_coefficient))
            model.var_lower_bounds.append(float(lower_bound))
            model.var_upper_bounds.append(float(upper_bound))
            model.variable_types.append(var_type)
            row = (variable_name, f"{variable_name}_{var_index}", "SUCCESS")
    return local_rows_df(spark, [row], VARIABLE_RESULT_SCHEMA)


def create_constraints(
    spark: SparkSession,
    model_name: str,
    constraint_name: str,
    lower_bound: float,
    upper_bound: float,
) -> DataFrame:
    """Add a range constraint lb ≤ a·x ≤ ub
    (reference: src/highs_extension.cpp:266-373)."""
    registry = ModelRegistry.instance()
    with registry.mutation_lock:
        model = registry.get_or_create_model(model_name)
        if constraint_name in model.constraint_indices:
            msg = f"Constraint '{constraint_name}' already exists in model '{model_name}'"
            row = (constraint_name, "ERROR", f"ERROR: {msg}")
        else:
            idx = model.next_constraint_index
            model.next_constraint_index += 1
            model.constraint_indices[constraint_name] = idx
            model.constraint_names.append(constraint_name)
            model.constraint_lower_bounds.append(float(lower_bound))
            model.constraint_upper_bounds.append(float(upper_bound))
            model.constraint_coefficients.setdefault(idx, [])
            row = (constraint_name, f"{constraint_name}_{idx}", "SUCCESS")
    return local_rows_df(spark, [row], CONSTRAINT_RESULT_SCHEMA)


def set_coefficients(
    spark: SparkSession,
    model_name: str,
    constraint_name: str,
    variable_name: str,
    coefficient: float,
) -> DataFrame:
    """Append a (constraint, variable) coefficient — appends without dedup,
    like the reference (reference: src/highs_extension.cpp:376-507)."""
    registry = ModelRegistry.instance()
    with registry.mutation_lock:
        model = registry.get_model(model_name)
        if model is None:
            status = f"ERROR: Model '{model_name}' not found"
            row = (constraint_name, variable_name, float(coefficient), status)
            return local_rows_df(spark, [row], COEFFICIENT_RESULT_SCHEMA)
        if variable_name not in model.variable_indices:
            msg = f"Variable '{variable_name}' not found in model '{model_name}'"
            row = (constraint_name, variable_name, float(coefficient), f"ERROR: {msg}")
        elif constraint_name not in model.constraint_indices:
            msg = f"Constraint '{constraint_name}' not found in model '{model_name}'"
            row = (constraint_name, variable_name, float(coefficient), f"ERROR: {msg}")
        else:
            var_idx = model.variable_indices[variable_name]
            con_idx = model.constraint_indices[constraint_name]
            model.constraint_coefficients.setdefault(con_idx, []).append(
                (var_idx, float(coefficient))
            )
            row = (constraint_name, variable_name, float(coefficient), "SUCCESS")
    return local_rows_df(spark, [row], COEFFICIENT_RESULT_SCHEMA)


def _assemble(model: HighsModelInfo):
    """Model state → solver arrays (c, a, row_lb, row_ub, col_lb, col_ub,
    is_int). The ONLY place the duplicate-coefficient summing rule and the
    binary [0,1] clamp live — shared by the primal solve and the dual
    report so the two can never assemble different matrices."""
    n = model.next_var_index
    m = model.next_constraint_index
    c = np.array(model.obj_coefficients, dtype=float)
    col_lb = np.array(model.var_lower_bounds, dtype=float)
    col_ub = np.array(model.var_upper_bounds, dtype=float)
    row_lb = np.array(model.constraint_lower_bounds, dtype=float)
    row_ub = np.array(model.constraint_upper_bounds, dtype=float)
    a = np.zeros((m, n))
    for row_idx, entries in model.constraint_coefficients.items():
        for var_idx, coeff in entries:
            a[row_idx, var_idx] += coeff  # duplicates sum (reference appends; HiGHS sums)

    is_int = np.zeros(n, dtype=bool)
    for i, vt in enumerate(model.variable_types):
        if vt == "binary":
            is_int[i] = True
            # binary clamps bounds to [0,1] (reference: src/highs_extension.cpp:577-584)
            col_lb[i] = max(0.0, col_lb[i])
            col_ub[i] = min(1.0, col_ub[i])
        elif vt == "integer":
            is_int[i] = True
    return c, a, row_lb, row_ub, col_lb, col_ub, is_int


def solve_model_info(model: HighsModelInfo) -> list[tuple[str, str, float, float, str]]:
    """Solve one in-memory model → solution rows (plain Python, no Spark).

    Shared by the driver-side :func:`solve` and the executor-side bulk path.
    Row order = variable insertion order (reference:
    src/highs_extension.cpp:669-685).
    """
    c, a, row_lb, row_ub, col_lb, col_ub, is_int = _assemble(model)

    if is_int.any():
        res = solve_milp(c, a, row_lb, row_ub, col_lb, col_ub, is_int)
    else:
        res = solve_lp(c, a, row_lb, row_ub, col_lb, col_ub)

    rows = []
    for i, name in enumerate(model.variable_names):
        sol = float(res.x[i]) if res.x.size > i else 0.0
        rc = float(res.reduced_costs[i]) if res.reduced_costs.size > i else 0.0
        rows.append((name, f"{name}_{i}", sol, rc, res.status))
    return rows


def solve(spark: SparkSession, model_name: str) -> DataFrame:
    """Solve a registry model → one row per variable
    (reference: src/highs_extension.cpp:512-722).

    Re-solves on every call — solver state is per-invocation, matching the
    reference's per-scan global state.
    """
    registry = ModelRegistry.instance()
    with registry.mutation_lock:  # stable snapshot of the model while solving
        model = registry.get_model(model_name)
        if model is None:
            row = ("N/A", "ERROR", 0.0, 0.0, f"ERROR: Model '{model_name}' not found")
            return local_rows_df(spark, [row], SOLVE_RESULT_SCHEMA)
        try:
            rows = solve_model_info(model)
        except Exception as e:  # error-as-data contract
            rows = [("N/A", "ERROR", 0.0, 0.0, f"ERROR: {e}")]
    return local_rows_df(spark, rows, SOLVE_RESULT_SCHEMA)


DUALS_RESULT_SCHEMA = (
    "constraint_name string, constraint_index string, dual double, "
    "activity double, status string"
)


def solve_model_duals(model: HighsModelInfo) -> list[tuple[str, str, float, float, str]]:
    """Solve → one row per CONSTRAINT with its dual (shadow price) and
    activity a·x.

    Beyond-reference surface: the reference exposes only variable-side
    ``col_dual`` (reduced cost, src/highs_extension.cpp:607); HiGHS also
    computes ``row_dual``, which is the economically meaningful shadow
    price (∂objective/∂rhs). Row order = constraint insertion order, the
    same contract the solve output keeps for variables. MILP models get
    dual 0.0 (duals are undefined for MIP), mirroring how the reference
    backfills reduced costs."""
    n = model.next_var_index
    m = model.next_constraint_index
    c, a, row_lb, row_ub, col_lb, col_ub, is_int = _assemble(model)

    if is_int.any():
        res = solve_milp(c, a, row_lb, row_ub, col_lb, col_ub, is_int)
        duals = np.zeros(m)
    else:
        res = solve_lp(c, a, row_lb, row_ub, col_lb, col_ub)
        duals = res.row_duals if res.row_duals.size == m else np.zeros(m)
    activity = a @ res.x if res.x.size == n else np.zeros(m)
    rows = []
    for i, name in enumerate(model.constraint_names):
        rows.append(
            (name, f"{name}_{i}", float(duals[i]), float(activity[i]), res.status)
        )
    return rows


def solve_duals(spark: SparkSession, model_name: str) -> DataFrame:
    """Shadow-price report for a registry model: one row per constraint."""
    registry = ModelRegistry.instance()
    with registry.mutation_lock:
        model = registry.get_model(model_name)
        if model is None:
            row = ("N/A", "ERROR", 0.0, 0.0, f"ERROR: Model '{model_name}' not found")
            return local_rows_df(spark, [row], DUALS_RESULT_SCHEMA)
        try:
            rows = solve_model_duals(model)
        except Exception as e:  # error-as-data contract
            rows = [("N/A", "ERROR", 0.0, 0.0, f"ERROR: {e}")]
    return local_rows_df(spark, rows, DUALS_RESULT_SCHEMA)
