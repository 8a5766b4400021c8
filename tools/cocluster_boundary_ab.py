#!/usr/bin/env python
"""COCLUSTER_MIN_BUILD_BYTES boundary A/B (VERDICT r10 item 3).

The 16 MB default came from ONE sf10 observation (19 MB estimated map →
−35% for the demotion). This tool locates the actual crossover: a
q10-shaped join (lineitem ⋈ filtered part, groupBy p_brand) where the
dim filter is a partkey modulus, so the BROADCAST BUILD MAP size is swept
directly (rows/m × COCLUSTER_ROW_BYTES) while the probe side stays
constant. Each size runs both arms:

- broadcast: HDS_DISABLE_COCLUSTER=1 (the plain planner path)
- cocluster: HDS_COCLUSTER_MIN_BUILD_BYTES=1 (force the demotion onto the
  layout's partkey-clustered copies of both tables)

Same-session arm-vs-arm comparison (reliable on this steal-prone host),
best-of-RUNS each, bucketed layout attached outside timing. Prints one
line per (map MB, arm) plus the per-size winner.

Usage: python tools/cocluster_boundary_ab.py SF_DIR [runs]
  SF_DIR needs the bucketed layout buildable (attach_bucketed) — sf10 is
  the documented scale for this boundary.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: modulus sweep: at sf10 part has ~2M rows, so 1/m of them x 48 B/row
#: gives build maps of ~4...96 MB across the claimed boundary
MODS = (24, 12, 6, 3, 1)


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    import pyspark.sql.functions as F

    from highs_duckdb_spark.functions.money import cents, money_sum
    from highs_duckdb_spark.plans import cbo
    from highs_duckdb_spark.session import get_spark, load_table, tune_for_data
    from highs_duckdb_spark.sources.layout import attach_bucketed

    spark = get_spark(
        "cocluster-boundary", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    attach_bucketed(spark, sf_dir)  # outside timing; builds once per dataset

    n_part = load_table(spark, "part", sf_dir).count()

    def q10_shaped(m: int):
        li = load_table(spark, "lineitem", sf_dir)
        part = load_table(spark, "part", sf_dir)
        rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
        g = cbo.JoinGraph(spark, sf_dir)
        g.fact("lineitem", li, catalog_rows=True)
        g.dim(
            "part",
            part,
            after=("lineitem",),
            on=("l_partkey", "p_partkey"),
            prepare=lambda df: df.filter(F.col("p_partkey") % m == 0),
            key="p_partkey",
            sel=1.0 / m,
        )
        return (
            g.plan()
            .groupBy("p_brand")
            .agg(
                money_sum(rev_c, 4).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .orderBy("p_brand")
        )

    def _mat(df) -> None:
        try:
            df.toArrow()
        except Exception:
            df.collect()

    def _best(m: int) -> float:
        _mat(q10_shaped(m))  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _mat(q10_shaped(m))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"part rows={n_part}  row_bytes={cbo.COCLUSTER_ROW_BYTES}", flush=True)
    default_min = cbo.COCLUSTER_MIN_BUILD_BYTES
    for m in MODS:
        est_mb = n_part / m * cbo.COCLUSTER_ROW_BYTES / (1 << 20)
        times = {}
        for arm in ("broadcast", "cocluster"):
            # COCLUSTER_MIN_BUILD_BYTES is bound at import time, so force
            # the arm via the module attribute + the per-call kill switch
            if arm == "broadcast":
                os.environ["HDS_DISABLE_COCLUSTER"] = "1"
                cbo.COCLUSTER_MIN_BUILD_BYTES = default_min
            else:
                os.environ.pop("HDS_DISABLE_COCLUSTER", None)
                cbo.COCLUSTER_MIN_BUILD_BYTES = 1
            times[arm] = _best(m)
            plan = q10_shaped(m)._jdf.queryExecution().executedPlan().toString()
            shape = "SHJ" if "ShuffledHashJoin" in plan else (
                "BHJ" if "BroadcastHashJoin" in plan else "?"
            )
            print(
                f"map~{est_mb:6.1f}MB (1/{m:<2d}) {arm:9s} {times[arm]:7.3f}s"
                f"  join={shape} exchanges="
                f"{plan.count('Exchange hashpartitioning')}",
                flush=True,
            )
        win = min(times, key=times.get)
        gain = (max(times.values()) - min(times.values())) / max(times.values())
        print(
            f"map~{est_mb:6.1f}MB winner={win} by {gain:5.1%}",
            flush=True,
        )
    os.environ.pop("HDS_DISABLE_COCLUSTER", None)
    cbo.COCLUSTER_MIN_BUILD_BYTES = default_min


if __name__ == "__main__":
    main()
