#!/usr/bin/env python
"""Run the workload-driven projection advisor over the query registry.

Captures every registered query's declared JoinGraph (build-only, results
never executed), aggregates matchable fact-pair joins into ranked
new-projection candidates, and — when run with --layout — reports the
planner's own match/decline record for the projections that already exist,
including the exact column widening that would serve each decline.

Usage:
  python tools/projection_advisor.py [SF_DIR] [--layout] [--out FILE]

Defaults: SF_DIR=/root/testdata/sf0.01. --layout attaches the bucketed
layout + projections first so the planner's matcher runs for real and its
declines are authoritative (plans/advisor.py, spec_coverage).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    with_layout = "--layout" in sys.argv
    out_file = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--out=")), None
    )

    from highs_duckdb_spark.plans import advisor
    from highs_duckdb_spark.session import get_spark, tune_for_data

    spark = get_spark("projection-advisor", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    if with_layout:
        from highs_duckdb_spark.sources.layout import attach_bucketed

        attach_bucketed(spark, sf_dir)

    records = advisor.capture_registry(spark, sf_dir)
    print(
        f"captured {len(records)} JoinGraph plans "
        f"({len(getattr(records, 'skipped', []))} builders skipped)",
        file=sys.stderr,
    )
    tables = {
        f["table"]
        for r in records
        if r.get("kind") != "topk"
        for f in r["facts"]
    }
    tinfo = advisor.table_info(sf_dir, tables)
    pairs = advisor.pair_candidates(records, tinfo)
    coverage = advisor.spec_coverage(records)
    agg_mvs = advisor.agg_mv_candidates(records, sf_dir)
    chains = advisor.chain_candidates(records)
    report = advisor.render_markdown(
        pairs,
        coverage,
        skipped=getattr(records, "skipped", []),
        agg_mvs=agg_mvs,
        chains=chains,
        mv_cov=advisor.mv_coverage(records),
        topk_copies=advisor.topk_copy_candidates(records),
    )
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(report + "\n")
    print(report)


if __name__ == "__main__":
    main()
