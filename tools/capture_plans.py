#!/usr/bin/env python
"""Dump .explain("formatted") for a set of queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [q1,q2,...]

Defaults to the bench HEADLINE set. Runs under the same session confs as
bench.py (latency mode + tune_for_data) so the captured plans are the plans
the graded bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from bench import HEADLINE

    names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(HEADLINE)

    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, tune_for_data

    spark = get_spark(
        "capture-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    tune_for_data(spark, sf_dir)
    if os.path.exists(os.path.join(sf_dir, "orders.parquet")):
        from highs_duckdb_spark.sources.layout import build_banded_orders

        build_banded_orders(spark, sf_dir)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        df = spec.builder(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — explain('formatted'), {suffix}\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
