#!/usr/bin/env python
"""Persisted-IVF-index A/B (round 11): s22 and s21's forced-post arm,
in-query training vs the persisted index, same session, alternating
arms, best-of-N (same-session relative timings are the reliable signal
on this host — see BENCH_SCALING's steal-window note).

Usage: python tools/ivf_index_ab.py [corpus_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/corpus100x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.operators.similarity import build_ivf_index
    from highs_duckdb_spark.session import get_spark
    from highs_duckdb_spark.sources import layout as L

    spark = get_spark("ivf-index-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    def best(fn):
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    def run(name, env=None):
        def _go():
            old = {}
            for k, v in (env or {}).items():
                old[k] = os.environ.get(k)
                os.environ[k] = v
            try:
                QUERIES[name].builder(spark, sf_dir).collect()
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        return best(_go)

    # warm (file cache + JVM)
    QUERIES["s22_filtered_ann_ivf_indexed"].builder(spark, sf_dir).collect()

    t_s22_inq = run("s22_filtered_ann_ivf_indexed")
    t_s21_inq = run("s21_filtered_ann_switch", {"HDS_S21_FORCE_ARM": "post"})

    t0 = time.perf_counter()
    build_ivf_index(spark, sf_dir)
    t_build = time.perf_counter() - t0
    assert L.attached_vector_index(spark, sf_dir) is not None

    t_s22_idx = run("s22_filtered_ann_ivf_indexed")
    t_s21_idx = run("s21_filtered_ann_switch", {"HDS_S21_FORCE_ARM": "post"})

    print(f"index build (once)            {t_build:7.3f}s")
    print(f"s22 in-query training         {t_s22_inq:7.3f}s")
    print(f"s22 persisted index           {t_s22_idx:7.3f}s  ({t_s22_idx/t_s22_inq:.2f}x)")
    print(f"s21 post, in-query training   {t_s21_inq:7.3f}s")
    print(f"s21 post, persisted index     {t_s21_idx:7.3f}s  ({t_s21_idx/t_s21_inq:.2f}x)")
    L.clear_alt_copies(spark)
    spark.stop()


if __name__ == "__main__":
    main()
