#!/usr/bin/env python
"""Phase decomposition of s05/s20 at the 100x corpus (VERDICT r11 item 1).

The claim to test: "floor-dominated" at 0.65-0.93 s, ~10x the measured
~76 ms per-action floor. Decompose one bench-identical action into:

  A. action floor         — spark.range(1) noop (scheduling + codegen)
  B. scan only            — embeddings scan -> noop sink (JVM only)
  C. scan -> Python+back  — identity mapInPandas over the same projection
                            (adds the Arrow boundary both ways, no work)
  D. matrix build only    — kernel that builds the per-batch float64
                            matrix the s05 kernel builds, emits 0 rows
  E. full s05 kernel      — local top-k, no global merge (noop sink)
  F. declared s05/s20     — the registered builder + bench materialize

Every phase is min-over-N of a fresh-built plan (same treatment the bench
gives the real query; localCheckpoint-free paths, nothing cached).

Usage: SPARK_GRAFT_SF_DIR=benchdata/corpus100x python tools/s05_decompose.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "benchdata/corpus100x")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import numpy as np

    from highs_duckdb_spark.operators import QUERIES
    from highs_duckdb_spark.operators.similarity import _collect_query_matrix
    from highs_duckdb_spark.session import (
        ensure_shipped,
        get_spark,
        load_table,
        tune_for_data,
    )

    spark = get_spark("s05-decompose", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    tune_for_data(spark, sf_dir)
    ensure_shipped(spark)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Host steal storms hit in multi-second windows (the committed
    # BENCH_SCALING noise protocol) — phases are therefore timed
    # ROUND-ROBIN interleaved, min per phase, so a storm inflates every
    # phase equally instead of whichever phase it landed on.
    phases: list[tuple[str, object, object]] = []

    def timed(label: str, build, materialize=noop) -> None:
        phases.append((label, build, materialize))

    def run_phases() -> None:
        best: dict[str, float] = {}
        for label, build, materialize in phases:  # warm pass (codegen/JIT)
            spark.sparkContext.setJobDescription(f"warm {label}")
            materialize(build())
        for _ in range(reps):
            for label, build, materialize in phases:
                spark.sparkContext.setJobDescription(label)
                t0 = time.perf_counter()
                materialize(build())
                dt = time.perf_counter() - t0
                best[label] = min(best.get(label, float("inf")), dt)
        for label, _, _ in phases:
            print(f"{label:44s} {best[label] * 1000:9.1f} ms")

    spark.sparkContext.setJobDescription("s05-decompose: warm tables")
    for t in ("embeddings", "documents"):
        load_table(spark, t, sf_dir).groupBy().count().collect()

    q_ids, q_mat, q_norm = _collect_query_matrix(spark, sf_dir)
    emb_cols = ["vec_id", "label", "embedding"]

    def emb():
        return load_table(spark, "embeddings", sf_dir).select(*emb_cols)

    n_parts = emb().rdd.getNumPartitions()
    print(f"embeddings scan partitions: {n_parts}; queries: {len(q_ids)}")

    spark.sparkContext.setJobDescription("A. action floor")
    timed("A. action floor (range(1) noop)", lambda: spark.range(1))

    spark.sparkContext.setJobDescription("B. scan only")
    timed("B. embeddings scan -> noop (JVM only)", emb)

    spark.sparkContext.setJobDescription("C. scan -> identity mapInPandas")

    def ident(batches):
        for pdf in batches:
            yield pdf[["vec_id"]]

    timed(
        "C. scan -> Python boundary (identity)",
        lambda: emb().mapInPandas(ident, "vec_id long"),
    )

    spark.sparkContext.setJobDescription("D. matrix build only")

    def matbuild(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            yield pd.DataFrame({"s": [float(mat.sum())]})

    timed(
        "D. + per-row float64 matrix build (s05 form)",
        lambda: emb().mapInPandas(matbuild, "s double"),
    )

    def matbuild_flat(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"s": [float(mat.sum())]})

    timed(
        "D2. + vstack matrix build (pandas cells)",
        lambda: emb().mapInPandas(matbuild_flat, "s double"),
    )

    import pyarrow as pa

    def matbuild_arrow(batches):
        import pyarrow.compute as pc

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            col = rb.column(rb.schema.get_field_index("embedding"))
            widths = pc.list_value_length(col).to_numpy()
            flat = np.asarray(col.flatten(), dtype=np.float32)
            assert (widths == q_mat.shape[1]).all()
            mat = flat.astype(np.float64).reshape(n, q_mat.shape[1])
            yield pa.RecordBatch.from_arrays(
                [pa.array([float(mat.sum())], type=pa.float64())], names=["s"]
            )

    timed(
        "D3. + flat-buffer matrix build (mapInArrow)",
        lambda: emb().mapInArrow(matbuild_arrow, "s double"),
    )

    spark.sparkContext.setJobDescription("E. full s05 kernel, no merge")
    from highs_duckdb_spark.operators.similarity import TOP_K

    def local_topk(batches):  # verbatim s05 kernel
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            sims = (mat @ q_mat.T) / (norms[:, None] * q_norm[None, :])
            sims = np.round(1e-9 + sims, 6)
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labels = pdf["label"].to_numpy()
            out = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = vec_ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                order = np.lexsort((vec_ids[cand_idx], -col[cand_idx]))[:TOP_K]
                take = cand_idx[order]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": vec_ids[take],
                            "label": labels[take],
                            "cosine": col[take],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    timed(
        "E. s05 kernel (local topk) -> noop",
        lambda: emb().mapInPandas(
            local_topk, "query_id long, neighbor_id long, label int, cosine double"
        ),
    )

    def bench_mat(df) -> None:  # the bench's materialize
        try:
            df.toArrow()
        except Exception:
            df.collect()

    for name in ("s05_cosine_topk_local_merge", "s20_filtered_ann"):
        spec = QUERIES[name]
        timed(
            f"F. {name} (bench materialize)",
            lambda spec=spec: spec.builder(spark, sf_dir),
            bench_mat,
        )

    run_phases()
    spark.stop()


if __name__ == "__main__":
    main()
