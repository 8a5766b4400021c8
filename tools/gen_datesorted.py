#!/usr/bin/env python
"""Build a DATE-CLUSTERED variant of an sf dir: lineitem range-partitioned
by l_shipdate and orders by o_orderdate (each a directory of ~128 files
with tight per-file date zones); every other table symlinked from the
source. This is the layout time-series fact data lands in on any real
ingestion pipeline — the shape where footer-sidecar time-window pruning
(sources/layout.py::pruned_scan_dates) pays.

Usage: python tools/gen_datesorted.py [src_dir] [out_dir] [files]
Defaults: src=<repo>/benchdata/sf10, out=<repo>/benchdata/sf10_dates, 128
(above layout.PRUNE_MIN_FILES, so the corpus actually engages file
pruning). Idempotent per (source fingerprint, file count).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SORTED = {"lineitem": "l_shipdate", "orders": "o_orderdate"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "benchdata", "sf10")
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "benchdata", "sf10_dates")
    )
    nfiles = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    import pyspark.sql.functions as F  # noqa: F401

    from highs_duckdb_spark.session import TABLES, get_spark, load_table
    from highs_duckdb_spark.sources import stats as zstats

    spark = get_spark("gen-datesorted", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src_path = os.path.abspath(os.path.join(src, f"{t}.parquet"))
        dst = os.path.join(out, f"{t}.parquet")
        if t not in SORTED:
            if not os.path.lexists(dst):
                os.symlink(src_path, dst)
            continue
        marker = os.path.join(out, f"_{t}_fingerprint.txt")
        fp = f"{zstats.path_fingerprint(src_path)}:{nfiles}"
        if os.path.isfile(marker) and open(marker).read() == fp:
            print(f"{t}: up to date", flush=True)
            continue
        col = SORTED[t]
        df = load_table(spark, t, src)
        # range partitioning gives DISJOINT per-file date spans — the
        # tightest zone maps a writer can produce without a format change
        (
            df.repartitionByRange(nfiles, F.col(col))
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(dst)
        )
        with open(marker, "w") as f:
            f.write(fp)
        print(f"{t}: written date-clustered on {col}", flush=True)
    print(f"done: {out}")
    spark.stop()


if __name__ == "__main__":
    main()
