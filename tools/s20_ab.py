#!/usr/bin/env python
"""Filtered-ANN scale A/B at a gen_corpus.py corpus (VERDICT r09 item 5).

Three measurements over CORPUS_DIR (documents/embeddings only):

1. **s20 join-strategy arms** — broadcast vs co-partitioned
   (HDS_S20_JOIN), and co-partitioned over ONE-OFF id-bucketed catalog
   copies of both tables (built here, outside timing, then pointed at via
   set_table_override) where the shuffled-hash join is exchange-free on
   both sides. The exchange count of each arm's executed plan is printed
   next to its time so the zero-shuffle claim is auditable, not asserted.
2. **s21 arms** — the data-driven switch (post on this corpus) vs
   HDS_S21_FORCE_ARM=pre: the selectivity tradeoff measured, not argued.
3. **Bucket-skew audit** (the d03 discipline): row counts per bucket of
   the id-bucketed embeddings copy — max/mean bucket ratio. Dense integer
   ids hash ~uniformly; the audit proves it at the scaled corpus.

Each timed rep materializes via toArrow (bench.py's protocol); best of
RUNS. DuckDB reference: the same entries' oracle SQL on identical files.

Usage: python tools/s20_ab.py CORPUS_DIR [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = 32


def _mat(df) -> None:
    try:
        df.toArrow()
    except Exception:
        df.collect()


def _best(fn, runs: int) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def main() -> None:
    corpus = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.session import (
        get_spark,
        set_table_override,
        tune_for_data,
    )

    spark = get_spark("s20-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_data(spark, corpus)

    def run_named(name: str) -> None:
        _mat(QUERIES[name].builder(spark, corpus))

    # --- 1. s20 join arms ---------------------------------------------------
    for arm in ("broadcast", "copartition"):
        os.environ["HDS_S20_JOIN"] = arm
        df = QUERIES["s20_filtered_ann"].builder(spark, corpus)
        t = _best(lambda: run_named("s20_filtered_ann"), runs)
        print(f"s20 {arm:22s} {t:7.3f}s  exchanges={_exchanges(df)}", flush=True)

    # id-bucketed copies (outside timing): the declared-layout arm.
    # register_alt_copy is the round-11 layout-catalog registration — with
    # BOTH copies registered the DEFAULT gate must pick the co-partitioned
    # join over them (no env override), which the 'auto' arm verifies.
    from highs_duckdb_spark.sources.layout import register_alt_copy

    ident = {}
    for table, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        ident[table] = f"hds_s20ab_{table}"
        spark.sql(f"DROP TABLE IF EXISTS {ident[table]}")
        path = os.path.join(corpus, f"_bucketed_{table}")
        (
            spark.read.parquet(os.path.join(corpus, f"{table}.parquet"))
            .repartition(BUCKETS, key)
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(BUCKETS, key)
            .sortBy(key)
            .saveAsTable(ident[table])
        )
        set_table_override(spark, corpus, table, spark.table(ident[table]))
        register_alt_copy(spark, corpus, table, [key], ident[table])
    os.environ["HDS_S20_JOIN"] = "copartition"
    df = QUERIES["s20_filtered_ann"].builder(spark, corpus)
    t = _best(lambda: run_named("s20_filtered_ann"), runs)
    print(f"s20 {'copartition+bucketed':22s} {t:7.3f}s  exchanges={_exchanges(df)}",
          flush=True)
    del os.environ["HDS_S20_JOIN"]

    # the round-11 default: no env override — the gate must see the
    # registered copies and land on the exchange-free shape by itself
    from highs_duckdb_spark.operators import similarity as S

    df = QUERIES["s20_filtered_ann"].builder(spark, corpus)
    t = _best(lambda: run_named("s20_filtered_ann"), runs)
    print(
        f"s20 {'auto(layout-aware)':22s} {t:7.3f}s  exchanges={_exchanges(df)}"
        f"  decision={S.S20_LAST_JOIN_DECISION}",
        flush=True,
    )

    # --- 3. bucket-skew audit of the id-bucketed embeddings copy ------------
    import pyspark.sql.functions as F

    counts = [
        r["n"]
        for r in spark.table(ident["embeddings"])
        .groupBy(F.expr(f"pmod(hash(vec_id), {BUCKETS})").alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    mx, mean = max(counts), sum(counts) / len(counts)
    print(f"skew buckets={len(counts)} max={mx} mean={mean:.0f} "
          f"max/mean={mx / mean:.3f}", flush=True)

    # --- 2. s21 arms ---------------------------------------------------------
    for table in ident.values():  # back to plain files for s21
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    from highs_duckdb_spark.session import clear_table_overrides

    clear_table_overrides(spark)
    t = _best(lambda: run_named("s21_filtered_ann_switch"), runs)
    print(f"s21 {'switch(post)':22s} {t:7.3f}s", flush=True)
    os.environ["HDS_S21_FORCE_ARM"] = "pre"
    t = _best(lambda: run_named("s21_filtered_ann_switch"), runs)
    print(f"s21 {'forced-pre':22s} {t:7.3f}s", flush=True)
    del os.environ["HDS_S21_FORCE_ARM"]

    # --- DuckDB reference on identical files ---------------------------------
    import duckdb

    con = duckdb.connect()
    for tbl in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{corpus}/{tbl}.parquet/*.parquet', union_by_name=true)"
        )
    for name in ("s20_filtered_ann", "s21_filtered_ann_switch"):
        sql = QUERIES[name].oracle
        con.execute(sql).fetch_arrow_table()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            best = min(best, time.perf_counter() - t0)
        print(f"duckdb {name:19s} {best:7.3f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
