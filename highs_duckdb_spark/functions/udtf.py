"""SQL table functions (Spark 4 Python UDTFs) — the literal analogue of the
reference's DuckDB table functions: after registration, the reference's own
SQL shape runs verbatim in Spark SQL::

    SELECT * FROM highs_create_variables('m', 'x', 0.0, 1e30, 1.0, 'continuous');
    SELECT * FROM highs_solve('m');

(reference: src/highs_extension.cpp:740-775 registrations;
example_usage.sql:40-54 usage).

UDTFs evaluate in Python worker processes with no affinity guarantees, so
model state lives in the file-backed store
(:mod:`highs_duckdb_spark.optim.udtf_store`): machine-global and
lock-guarded, preserving the reference's process-global registry semantics
across whichever workers the statements land on. The driver-side API in
:mod:`highs_duckdb_spark.optim.registry` is the primary programmatic path;
the distributed path for real scale is :mod:`highs_duckdb_spark.optim.bulk`.

Caveat (inherent to side-effecting table functions): a Spark task retry or
speculative duplicate re-executes ``eval`` — a create that already persisted
then reports a duplicate ERROR row. Single-task constant-argument calls
make this window tiny, but exactly-once mutation semantics need the
driver-side API; this layer exists for verbatim SQL-script compatibility.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from highs_duckdb_spark.session import ensure_shipped


@udtf(returnType="variable_name string, variable_index string, status string")
class HighsCreateVariablesUDTF:
    def eval(  # noqa: D102
        self,
        model_name: str,
        variable_name: str,
        lower_bound: float,
        upper_bound: float,
        obj_coefficient: float,
        var_type: str,
    ):
        from highs_duckdb_spark.optim.udtf_store import locked_model

        with locked_model(model_name, create=True) as model:
            if variable_name in model.variable_indices:
                msg = f"Variable '{variable_name}' already exists in model '{model_name}'"
                yield (variable_name, "ERROR", f"ERROR: {msg}")
                return
            idx = model.next_var_index
            model.next_var_index += 1
            model.variable_indices[variable_name] = idx
            model.variable_names.append(variable_name)
            model.obj_coefficients.append(float(obj_coefficient))
            model.var_lower_bounds.append(float(lower_bound))
            model.var_upper_bounds.append(float(upper_bound))
            model.variable_types.append(var_type)
        yield (variable_name, f"{variable_name}_{idx}", "SUCCESS")


@udtf(returnType="constraint_name string, constraint_index string, status string")
class HighsCreateConstraintsUDTF:
    def eval(self, model_name: str, constraint_name: str, lower_bound: float, upper_bound: float):  # noqa: D102
        from highs_duckdb_spark.optim.udtf_store import locked_model

        with locked_model(model_name, create=True) as model:
            if constraint_name in model.constraint_indices:
                msg = f"Constraint '{constraint_name}' already exists in model '{model_name}'"
                yield (constraint_name, "ERROR", f"ERROR: {msg}")
                return
            idx = model.next_constraint_index
            model.next_constraint_index += 1
            model.constraint_indices[constraint_name] = idx
            model.constraint_names.append(constraint_name)
            model.constraint_lower_bounds.append(float(lower_bound))
            model.constraint_upper_bounds.append(float(upper_bound))
            model.constraint_coefficients.setdefault(idx, [])
        yield (constraint_name, f"{constraint_name}_{idx}", "SUCCESS")


@udtf(
    returnType="constraint_name string, variable_name string, coefficient double, status string"
)
class HighsSetCoefficientsUDTF:
    def eval(self, model_name: str, constraint_name: str, variable_name: str, coefficient: float):  # noqa: D102
        from highs_duckdb_spark.optim.udtf_store import locked_model

        with locked_model(model_name, create=False) as model:
            if model is None:
                yield (
                    constraint_name,
                    variable_name,
                    float(coefficient),
                    f"ERROR: Model '{model_name}' not found",
                )
                return
            if variable_name not in model.variable_indices:
                msg = f"Variable '{variable_name}' not found in model '{model_name}'"
                yield (constraint_name, variable_name, float(coefficient), f"ERROR: {msg}")
                return
            if constraint_name not in model.constraint_indices:
                msg = f"Constraint '{constraint_name}' not found in model '{model_name}'"
                yield (constraint_name, variable_name, float(coefficient), f"ERROR: {msg}")
                return
            model.constraint_coefficients.setdefault(
                model.constraint_indices[constraint_name], []
            ).append((model.variable_indices[variable_name], float(coefficient)))
        yield (constraint_name, variable_name, float(coefficient), "SUCCESS")


@udtf(
    returnType=(
        "variable_name string, variable_index string, solution_value double, "
        "reduced_cost double, status string"
    )
)
class HighsSolveUDTF:
    def eval(self, model_name: str):  # noqa: D102
        from highs_duckdb_spark.optim.registry import solve_model_info
        from highs_duckdb_spark.optim.udtf_store import locked_model

        with locked_model(model_name, create=False, readonly=True) as model:
            if model is None:
                yield ("N/A", "ERROR", 0.0, 0.0, f"ERROR: Model '{model_name}' not found")
                return
            try:
                rows = solve_model_info(model)
            except Exception as e:
                rows = [("N/A", "ERROR", 0.0, 0.0, f"ERROR: {e}")]
        for row in rows:
            yield row


@udtf(returnType="model_name string, status string")
class HighsRemoveModelUDTF:
    """Drop a model from the store.

    Beyond-reference: ``HighsModelRegistry::RemoveModel`` exists in the
    C++ (reference: src/highs_extension.cpp:72-75) but is never registered
    as a SQL function, so reference models leak until process exit. SQL
    scripts here can clean up after themselves; removing a missing model
    follows the error-as-status-row contract rather than raising."""

    def eval(self, model_name: str):  # noqa: D102
        from highs_duckdb_spark.optim.udtf_store import remove_model_checked

        # check + delete are ONE locked operation: a concurrent create
        # can land before or after the removal, never inside it
        if remove_model_checked(model_name):
            yield (model_name, "SUCCESS")
        else:
            yield (model_name, f"ERROR: Model '{model_name}' not found")


def register_table_functions(spark: SparkSession) -> None:
    """Register the table functions under the reference's SQL names (plus
    highs_remove_model, which the reference implements but never exposes)."""
    ensure_shipped(spark)
    spark.udtf.register("highs_create_variables", HighsCreateVariablesUDTF)
    spark.udtf.register("highs_create_constraints", HighsCreateConstraintsUDTF)
    spark.udtf.register("highs_set_coefficients", HighsSetCoefficientsUDTF)
    spark.udtf.register("highs_solve", HighsSolveUDTF)
    spark.udtf.register("highs_remove_model", HighsRemoveModelUDTF)
