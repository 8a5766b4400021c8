#!/usr/bin/env python
"""Delivery-path A/B for the q80/q30 class (VERDICT r09 item 2).

The round-9 decompositions attribute 50-94% of q80/q30's sf100 wall time
to delivering a 20M/45M-row globally-ordered result through the driver's
single Arrow stream. Three delivery arms per query, Spark vs DuckDB on
identical files:

1. **arrow@default** — ``toArrow()`` at the default
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k rows/batch);
   DuckDB: ``fetch_arrow_table()``. This is bench.py's protocol.
2. **arrow@1M** — the same with 1M-row batches (fewer flushes, bigger
   IPC frames — the sweep's far end; intermediate points printed too).
3. **parquet-sink** — the ordered result written to parquet instead of
   pulled to the driver: Spark's DISTRIBUTED sink (every partition
   writes in parallel — how a 100 TB engine actually delivers) vs
   DuckDB ``COPY (...) TO parquet``. If Spark-at-parity here, the graded
   gap is the single-consumer driver protocol, not the engine.

Usage: [HDS_AB_LAYOUT=1] python tools/delivery_ab.py SF_DIR RUNS q30...
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_SWEEP = [10_000, 100_000, 1_000_000]


def _best(fn, runs: int, spark=None) -> float:
    """Best-of-runs with an explicit GC between reps: Spark's shuffle temp
    files are removed by the ContextCleaner only when the JVM garbage-
    collects the shuffle references — repeated 45M-row materializations
    otherwise accumulate ~fact-sized temp files and exhaust local disk
    (observed at sf100) before any rep's own spill would."""

    def gc_pass() -> None:
        if spark is None:
            return
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)  # let the ContextCleaner drain
        except Exception:
            pass

    fn()  # warm
    gc_pass()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        gc_pass()
    return best


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import get_spark, tune_for_data

    spark = get_spark(
        "delivery-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, sf_dir)
    layout_paths: dict[str, str] = {}
    if os.environ.get("HDS_AB_LAYOUT"):
        from highs_duckdb_spark.sources.layout import attach_bucketed

        layout_paths = attach_bucketed(spark, sf_dir)

    sink = tempfile.mkdtemp(prefix="hds_delivery_ab_")
    try:
        for name in names:
            q = QUERIES[name]
            for batch in BATCH_SWEEP:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
                )
                t = _best(lambda: q.builder(spark, sf_dir).toArrow(), runs, spark)
                print(f"{name} spark arrow@{batch:<9d} {t:7.3f}s", flush=True)
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

            def spark_sink() -> None:
                out = os.path.join(sink, "spark_out")
                shutil.rmtree(out, ignore_errors=True)
                q.builder(spark, sf_dir).write.mode("overwrite").parquet(out)

            t = _best(spark_sink, runs, spark)
            print(f"{name} spark parquet-sink     {t:7.3f}s", flush=True)

            import duckdb

            con = duckdb.connect()
            con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
            for tbl in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings"
            ).split():
                src = (
                    f"{layout_paths[tbl]}/*.parquet"
                    if tbl in layout_paths
                    else f"{sf_dir}/{tbl}.parquet"
                )
                if os.path.isdir(f"{sf_dir}/{tbl}.parquet"):
                    src = (
                        f"{layout_paths[tbl]}/*.parquet"
                        if tbl in layout_paths
                        else f"{sf_dir}/{tbl}.parquet/*.parquet"
                    )
                con.execute(
                    f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{src}')"
                )
            t = _best(lambda: con.execute(q.oracle).fetch_arrow_table(), runs)
            print(f"{name} duckdb arrow           {t:7.3f}s", flush=True)
            out = os.path.join(sink, "duck_out.parquet")

            def duck_sink() -> None:
                if os.path.exists(out):
                    os.remove(out)
                con.execute(f"COPY ({q.oracle}) TO '{out}' (FORMAT parquet)")

            t = _best(duck_sink, runs)
            print(f"{name} duckdb parquet-sink    {t:7.3f}s", flush=True)
            con.close()
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
