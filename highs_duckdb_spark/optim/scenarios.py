"""The reference repo's two example optimization scenarios, re-expressed as
data (arc/site tables) + builders against the registry API.

- Min-cost-flow assignment (reference: network_flow_example.sql:10-165):
  34 continuous arc variables, 14 flow-conservation constraints.
- Data-center site selection MIP (reference: assignment_model_test.sql:23-127):
  15 binary variables, 9 constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.optim.registry import (
    ModelRegistry,
    create_constraints,
    create_variables,
    set_coefficients,
    solve,
)

# (variable, lower, upper, cost) — reference: network_flow_example.sql:12-58
NETWORK_FLOW_ARCS: list[tuple[str, float, float, float]] = [
    ("x_0_11", 0, 2, 0), ("x_0_12", 0, 2, 0),
    ("x_11_1", 0, 1, 0), ("x_11_3", 0, 1, 0), ("x_11_5", 0, 1, 0),
    ("x_12_2", 0, 1, 0), ("x_12_4", 0, 1, 0), ("x_12_6", 0, 1, 0),
    ("x_1_7", 0, 1, 90), ("x_1_8", 0, 1, 76), ("x_1_9", 0, 1, 75), ("x_1_10", 0, 1, 70),
    ("x_2_7", 0, 1, 35), ("x_2_8", 0, 1, 85), ("x_2_9", 0, 1, 55), ("x_2_10", 0, 1, 65),
    ("x_3_7", 0, 1, 125), ("x_3_8", 0, 1, 95), ("x_3_9", 0, 1, 90), ("x_3_10", 0, 1, 105),
    ("x_4_7", 0, 1, 45), ("x_4_8", 0, 1, 110), ("x_4_9", 0, 1, 95), ("x_4_10", 0, 1, 115),
    ("x_5_7", 0, 1, 60), ("x_5_8", 0, 1, 105), ("x_5_9", 0, 1, 80), ("x_5_10", 0, 1, 75),
    ("x_6_7", 0, 1, 45), ("x_6_8", 0, 1, 65), ("x_6_9", 0, 1, 110), ("x_6_10", 0, 1, 95),
    ("x_7_13", 0, 1, 0), ("x_8_13", 0, 1, 0), ("x_9_13", 0, 1, 0), ("x_10_13", 0, 1, 0),
]

# constraint -> (lb, ub, {variable: coeff}) — reference: network_flow_example.sql:60-165
NETWORK_FLOW_CONSTRAINTS: list[tuple[str, float, float, dict[str, float]]] = [
    ("source_flow", 4, 4, {"x_0_11": 1, "x_0_12": 1}),
    ("team_a_flow", 0, 0, {"x_0_11": 1, "x_11_1": -1, "x_11_3": -1, "x_11_5": -1}),
    ("team_b_flow", 0, 0, {"x_0_12": 1, "x_12_2": -1, "x_12_4": -1, "x_12_6": -1}),
    ("worker_1_flow", 0, 0, {"x_11_1": 1, "x_1_7": -1, "x_1_8": -1, "x_1_9": -1, "x_1_10": -1}),
    ("worker_2_flow", 0, 0, {"x_12_2": 1, "x_2_7": -1, "x_2_8": -1, "x_2_9": -1, "x_2_10": -1}),
    ("worker_3_flow", 0, 0, {"x_11_3": 1, "x_3_7": -1, "x_3_8": -1, "x_3_9": -1, "x_3_10": -1}),
    ("worker_4_flow", 0, 0, {"x_12_4": 1, "x_4_7": -1, "x_4_8": -1, "x_4_9": -1, "x_4_10": -1}),
    ("worker_5_flow", 0, 0, {"x_11_5": 1, "x_5_7": -1, "x_5_8": -1, "x_5_9": -1, "x_5_10": -1}),
    ("worker_6_flow", 0, 0, {"x_12_6": 1, "x_6_7": -1, "x_6_8": -1, "x_6_9": -1, "x_6_10": -1}),
    ("task_7_flow", 0, 0, {"x_1_7": 1, "x_2_7": 1, "x_3_7": 1, "x_4_7": 1, "x_5_7": 1, "x_6_7": 1, "x_7_13": -1}),
    ("task_8_flow", 0, 0, {"x_1_8": 1, "x_2_8": 1, "x_3_8": 1, "x_4_8": 1, "x_5_8": 1, "x_6_8": 1, "x_8_13": -1}),
    ("task_9_flow", 0, 0, {"x_1_9": 1, "x_2_9": 1, "x_3_9": 1, "x_4_9": 1, "x_5_9": 1, "x_6_9": 1, "x_9_13": -1}),
    ("task_10_flow", 0, 0, {"x_1_10": 1, "x_2_10": 1, "x_3_10": 1, "x_4_10": 1, "x_5_10": 1, "x_6_10": 1, "x_10_13": -1}),
    ("sink_flow", 4, 4, {"x_7_13": 1, "x_8_13": 1, "x_9_13": 1, "x_10_13": 1}),
]

#: worker→task arc costs, as in the post-solve CASE table
#: (reference: network_flow_example.sql:183-207)
ASSIGNMENT_COSTS = {name: cost for name, _, _, cost in NETWORK_FLOW_ARCS if cost > 0}

# (variable, cost) — binary site/assignment vars
# reference: assignment_model_test.sql:25-44
DATACENTER_VARS: list[tuple[str, float]] = [
    ("x_DC1_D1", 10.0), ("x_DC1_D2", 15.0), ("x_DC1_D3", 20.0), ("x_DC1_D4", 25.0),
    ("x_DC2_D1", 20.0), ("x_DC2_D2", 10.0), ("x_DC2_D3", 15.0), ("x_DC2_D4", 30.0),
    ("x_DC3_D1", 25.0), ("x_DC3_D2", 20.0), ("x_DC3_D3", 10.0), ("x_DC3_D4", 15.0),
    ("z_DC1", 100.0), ("z_DC2", 120.0), ("z_DC3", 110.0),
]

# reference: assignment_model_test.sql:50-124
DATACENTER_CONSTRAINTS: list[tuple[str, float, float, dict[str, float]]] = [
    ("demand_D1", 1.0, 1.0, {"x_DC1_D1": 1, "x_DC2_D1": 1, "x_DC3_D1": 1}),
    ("demand_D2", 1.0, 1.0, {"x_DC1_D2": 1, "x_DC2_D2": 1, "x_DC3_D2": 1}),
    ("demand_D3", 1.0, 1.0, {"x_DC1_D3": 1, "x_DC2_D3": 1, "x_DC3_D3": 1}),
    ("demand_D4", 1.0, 1.0, {"x_DC1_D4": 1, "x_DC2_D4": 1, "x_DC3_D4": 1}),
    ("capacity_DC1", -1e30, 0.0, {"x_DC1_D1": 1, "x_DC1_D2": 1, "x_DC1_D3": 1, "x_DC1_D4": 1, "z_DC1": -3}),
    ("capacity_DC2", -1e30, 0.0, {"x_DC2_D1": 1, "x_DC2_D2": 1, "x_DC2_D3": 1, "x_DC2_D4": 1, "z_DC2": -2}),
    ("capacity_DC3", -1e30, 0.0, {"x_DC3_D1": 1, "x_DC3_D2": 1, "x_DC3_D3": 1, "x_DC3_D4": 1, "z_DC3": -3}),
    ("min_datacenters", 1.0, 1e30, {"z_DC1": 1, "z_DC2": 1, "z_DC3": 1}),
    ("max_datacenters", -1e30, 2.0, {"z_DC1": 1, "z_DC2": 1, "z_DC3": 1}),
]


def build_network_flow_model(spark: SparkSession, model_name: str = "assignment_model") -> None:
    """Rebuild the min-cost-flow model from scratch (idempotent)."""
    ModelRegistry.instance().remove_model(model_name)
    for name, lb, ub, cost in NETWORK_FLOW_ARCS:
        create_variables(spark, model_name, name, lb, ub, cost, "continuous")
    for cname, lb, ub, coeffs in NETWORK_FLOW_CONSTRAINTS:
        create_constraints(spark, model_name, cname, lb, ub)
        for vname, coeff in coeffs.items():
            set_coefficients(spark, model_name, cname, vname, coeff)


def build_datacenter_model(spark: SparkSession, model_name: str = "datacenter_model") -> None:
    """Rebuild the site-selection MIP from scratch (idempotent)."""
    ModelRegistry.instance().remove_model(model_name)
    for name, cost in DATACENTER_VARS:
        create_variables(spark, model_name, name, 0.0, 1.0, cost, "binary")
    for cname, lb, ub, coeffs in DATACENTER_CONSTRAINTS:
        create_constraints(spark, model_name, cname, lb, ub)
        for vname, coeff in coeffs.items():
            set_coefficients(spark, model_name, cname, vname, coeff)


def solve_network_flow(spark: SparkSession, model_name: str = "assignment_model") -> DataFrame:
    build_network_flow_model(spark, model_name)
    return solve(spark, model_name)


def solve_datacenter(spark: SparkSession, model_name: str = "datacenter_model") -> DataFrame:
    build_datacenter_model(spark, model_name)
    return solve(spark, model_name)
