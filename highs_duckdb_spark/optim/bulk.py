"""Bulk/relational optimization API — the 100-TB-scale path.

The reference's own examples define models *relationally* (three tables:
variables / constraints / coefficients — reference: example_usage.sql:19-36,
test/sql/highs.test:31-51). This module accepts exactly that encoding as
DataFrames and solves **many independent models in parallel**: rows shuffle
once on ``model_name``, and each model is assembled + solved inside a
grouped-map pandas UDF on an executor. Model construction is distributed;
per-model solve is a single Arrow-batched task. This is how thousands of
per-key LP/MIPs (one per customer/region/scenario) run on a cluster.

Schemas (matching FIXTURES.md §A):

- variables:    model_name, variable_name, lower_bound, upper_bound,
                obj_coefficient, var_type
- constraints:  model_name, constraint_name, lower_bound, upper_bound
- coefficients: model_name, constraint_name, variable_name, coefficient

Ordering: the reference assigns indices by insertion order; a distributed
table has no row order, so the bulk API uses **name-sorted order** unless an
explicit integer ``ord`` column is provided on variables/constraints.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.session import ensure_shipped
from highs_duckdb_spark.optim.registry import (
    SOLVE_RESULT_SCHEMA,
    HighsModelInfo,
    solve_model_info,
)

BULK_RESULT_SCHEMA = "model_name string, " + SOLVE_RESULT_SCHEMA

_KIND_VAR, _KIND_CON, _KIND_COEF = "v", "c", "k"


def _pack(variables_df: DataFrame, constraints_df: DataFrame, coefficients_df: DataFrame) -> DataFrame:
    """Union the three model tables into one long frame keyed by model_name."""
    has_vord = "ord" in variables_df.columns
    has_cord = "ord" in constraints_df.columns
    v = variables_df.select(
        "model_name",
        F.lit(_KIND_VAR).alias("kind"),
        F.col("variable_name").alias("name"),
        F.lit(None).cast("string").alias("name2"),
        F.col("lower_bound").cast("double"),
        F.col("upper_bound").cast("double"),
        F.col("obj_coefficient").cast("double").alias("obj"),
        F.col("var_type").alias("vtype"),
        F.lit(None).cast("double").alias("coefficient"),
        (F.col("ord").cast("long") if has_vord else F.lit(None).cast("long")).alias("ord"),
    )
    c = constraints_df.select(
        "model_name",
        F.lit(_KIND_CON).alias("kind"),
        F.col("constraint_name").alias("name"),
        F.lit(None).cast("string").alias("name2"),
        F.col("lower_bound").cast("double"),
        F.col("upper_bound").cast("double"),
        F.lit(None).cast("double").alias("obj"),
        F.lit(None).cast("string").alias("vtype"),
        F.lit(None).cast("double").alias("coefficient"),
        (F.col("ord").cast("long") if has_cord else F.lit(None).cast("long")).alias("ord"),
    )
    k = coefficients_df.select(
        "model_name",
        F.lit(_KIND_COEF).alias("kind"),
        F.col("constraint_name").alias("name"),
        F.col("variable_name").alias("name2"),
        F.lit(None).cast("double").alias("lower_bound"),
        F.lit(None).cast("double").alias("upper_bound"),
        F.lit(None).cast("double").alias("obj"),
        F.lit(None).cast("string").alias("vtype"),
        F.col("coefficient").cast("double"),
        F.lit(None).cast("long").alias("ord"),
    )
    return v.unionByName(c).unionByName(k)


def _error_row(model_name: str, message: str) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "model_name": model_name,
                "variable_name": "N/A",
                "variable_index": "ERROR",
                "solution_value": 0.0,
                "reduced_cost": 0.0,
                "status": f"ERROR: {message}",
            }
        ]
    )


def _solve_one_model(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: rows of ONE model → solution rows (runs on executors)."""
    model_name = pdf["model_name"].iloc[0]
    info = HighsModelInfo()
    vrows = pdf[pdf["kind"] == _KIND_VAR]
    if vrows.empty:
        # constraints/coefficients referencing a model with no variables
        # (errors-are-data: never raise out of the kernel — an empty result
        # frame would also fail Spark's schema check)
        return _error_row(model_name, "model has no variables")
    vrows = vrows.sort_values(
        ["ord", "name"] if vrows["ord"].notna().all() else ["name"], kind="mergesort"
    )
    for _, r in vrows.iterrows():
        if r["name"] in info.variable_indices:
            # registry-path parity: duplicate names are an ERROR row, not a
            # silently malformed LP (reference: src/highs_extension.cpp:177-182)
            return _error_row(
                model_name,
                f"Variable '{r['name']}' already exists in model '{model_name}'",
            )
        idx = info.next_var_index
        info.next_var_index += 1
        info.variable_indices[r["name"]] = idx
        info.variable_names.append(r["name"])
        info.obj_coefficients.append(float(r["obj"]))
        info.var_lower_bounds.append(float(r["lower_bound"]))
        info.var_upper_bounds.append(float(r["upper_bound"]))
        info.variable_types.append(r["vtype"])
    crows = pdf[pdf["kind"] == _KIND_CON]
    crows = crows.sort_values(
        ["ord", "name"] if crows["ord"].notna().all() else ["name"], kind="mergesort"
    )
    for _, r in crows.iterrows():
        if r["name"] in info.constraint_indices:
            return _error_row(
                model_name,
                f"Constraint '{r['name']}' already exists in model '{model_name}'",
            )
        idx = info.next_constraint_index
        info.next_constraint_index += 1
        info.constraint_indices[r["name"]] = idx
        info.constraint_names.append(r["name"])
        info.constraint_lower_bounds.append(float(r["lower_bound"]))
        info.constraint_upper_bounds.append(float(r["upper_bound"]))
        info.constraint_coefficients[idx] = []
    for _, r in pdf[pdf["kind"] == _KIND_COEF].iterrows():
        ci = info.constraint_indices.get(r["name"])
        vi = info.variable_indices.get(r["name2"])
        if ci is None or vi is None:
            return _error_row(
                model_name,
                f"unknown constraint '{r['name']}'"
                if ci is None
                else f"unknown variable '{r['name2']}'",
            )
        info.constraint_coefficients[ci].append((vi, float(r["coefficient"])))
    try:
        rows = solve_model_info(info)
    except Exception as e:  # error-as-data, matching the reference contract
        rows = [("N/A", "ERROR", 0.0, 0.0, f"ERROR: {e}")]
    return pd.DataFrame(
        [
            {
                "model_name": model_name,
                "variable_name": n,
                "variable_index": i,
                "solution_value": s,
                "reduced_cost": rc,
                "status": st,
            }
            for (n, i, s, rc, st) in rows
        ]
    )


def solve_many(
    variables_df: DataFrame,
    constraints_df: DataFrame,
    coefficients_df: DataFrame,
) -> DataFrame:
    """Solve every model present in the input tables, in parallel.

    One shuffle on ``model_name``; each group solves independently in a
    pandas-UDF task. Output: BULK_RESULT_SCHEMA, one row per variable per
    model (plus error rows per the status contract).
    """
    ensure_shipped(variables_df.sparkSession)
    packed = _pack(variables_df, constraints_df, coefficients_df)
    return solve_packed(packed)


def _solve_model_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batched grouped-map kernel: rows of SEVERAL models (one hash bucket
    of model_names) → concatenated solution rows. Same per-model logic as
    :func:`_solve_one_model`; batching amortizes the per-group Arrow
    round-trip + task overhead when models are tiny (see
    :func:`solve_packed`'s batch_models)."""
    return pd.concat(
        [_solve_one_model(g) for _, g in pdf.groupby("model_name", sort=False)],
        ignore_index=True,
    )


def solve_packed(packed: DataFrame, batch_models: bool | None = None) -> DataFrame:
    """Solve models already in the packed long form (see :func:`_pack`).

    Callers that assemble the long frame themselves (e.g. in one SQL
    statement) skip ``_pack``'s per-table projections. Expected columns:
    model_name, kind ('v'|'c'|'k'), name, name2, lower_bound, upper_bound,
    obj, vtype, coefficient, ord.

    ``batch_models`` (round 11, VERDICT r10 item 7): group by a HASH
    BUCKET of model_name instead of model_name itself, so one pandas-UDF
    task solves every model in its bucket. The opt05 decomposition showed
    per-group overhead (Arrow round-trip + task scheduling per tiny
    model), not simplex time, dominated the per-model form; bucketing
    keeps the same one-shuffle scale shape (width = defaultParallelism,
    so a 10k-model workload still fans out across every core) while
    bounding the task count at the core count. Measured at sf100
    (benchruns/opt05_decompose_sf100.txt): batched 0.78× of per-model.

    Default is the batched form (round 11); ``HDS_OPT_BULK_PER_MODEL=1``
    or ``batch_models=False`` restores per-model tasks — preferable only
    when model count is near the core count AND model sizes are wildly
    uneven (hash-bucketing could then pair two big models on one core
    while others idle; with many tiny models, the measured regime here,
    batching is a pure overhead win).
    """
    spark = packed.sparkSession
    if batch_models is None:
        batch_models = os.environ.get("HDS_OPT_BULK_PER_MODEL") != "1"
    ensure_shipped(spark)
    # LP solves are CPU-bound Python work: spread models across every core
    # instead of inheriting spark.sql.shuffle.partitions (often tuned low
    # for tiny exchange stages — e.g. the latency bench uses 2, which would
    # serialize 200 solves onto 2 workers). The explicit repartition on the
    # grouping key satisfies applyInPandas' clustering requirement, so no
    # second exchange is added.
    width = spark.sparkContext.defaultParallelism
    if batch_models:
        bucket = F.pmod(F.hash("model_name"), F.lit(width))
        return (
            packed.withColumn("__bucket", bucket)
            .repartition(width, "__bucket")
            .groupBy("__bucket")
            .applyInPandas(
                lambda pdf: _solve_model_batch(pdf.drop(columns="__bucket")),
                BULK_RESULT_SCHEMA,
            )
        )
    return (
        packed.repartition(width, "model_name")
        .groupBy("model_name")
        .applyInPandas(_solve_one_model, BULK_RESULT_SCHEMA)
    )


def solve_from_tables(
    spark: SparkSession,
    variables_df: DataFrame,
    constraints_df: DataFrame,
    coefficients_df: DataFrame,
    model_name: str,
) -> DataFrame:
    """Solve a single relationally-defined model (reference:
    example_usage.sql:19-54 flow, where the model tables are CTAS'd first)."""
    flt = F.col("model_name") == model_name
    return solve_many(
        variables_df.filter(flt), constraints_df.filter(flt), coefficients_df.filter(flt)
    ).drop("model_name")
