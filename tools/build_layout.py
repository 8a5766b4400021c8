#!/usr/bin/env python
"""Two-phase sf100 layout build (round 11 — committing the protocol that
rounds 9/10 ran as inline scripts; see benchruns/build_layout_sf100_r10c.log).

Why two phases: the lineitem_orders projection build's fan-out shuffle
needs ~45 GB of scratch on this host, but after the ALT copies
(lineitem__by_partkey, part__by_partkey) are on disk only ~19 GB remain.
So build the projection + MV FIRST (phase 1, alt specs popped), then the
alt copies (phase 2 — their build is the shuffle-free coalesce path, no
scratch spike). attach_bucketed is fingerprint-idempotent, so phase 2
re-attaches phase 1's files without rebuilding them.

Usage: python tools/build_layout.py SF_DIR [LAYOUT_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    from highs_duckdb_spark.session import clear_table_overrides, get_spark
    from highs_duckdb_spark.sources import layout as L

    layout_dir = sys.argv[2] if len(sys.argv) > 2 else L.default_layout_dir(sf_dir)
    spark = get_spark(
        "layout-build",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # zstd shuffle/spill compression: the projection build's fan-out
        # shuffle is DISK-bound on this host (lz4 temp hit ENOSPC with
        # ~39 GB free, round 11) — zstd shrinks the temp ~40% for a
        # build whose cost is one-off and untimed
        conf={"spark.io.compression.codec": "zstd"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    popped = {t: L.ALT_BUCKET_SPECS.pop(t) for t in ("lineitem", "part")}
    try:
        paths = L.attach_bucketed(spark, sf_dir, layout_dir)
        print("phase1 built:", sorted(paths), flush=True)
    finally:
        L.ALT_BUCKET_SPECS.update(popped)
    clear_table_overrides(spark)
    paths = L.attach_bucketed(spark, sf_dir, layout_dir)
    print("phase2 built:", sorted(paths), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
