"""Focused equivalence tests for the round-12 rewrites that changed an
operator's internals (beyond the full-registry oracle parity, which pins
the end results on the graded corpora):

- q38/q125's group-key try_cast moved ABOVE the aggregation: per group,
  ``count(f(key)) == count(*) if f(key) IS NOT NULL else 0`` and
  ``first(f(key)) == f(key)`` — exercised here on a corpus the parquet
  testdata cannot produce (a NULL group key, an all-parsable key, and a
  key whose try_cast fails), so the edge the proof leans on is pinned.
- t25's sketch algebra: summing per-token counts into the (row, bucket)
  cells equals counting token instances per cell.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from highs_duckdb_spark.session import local_rows_df


def _rows(spark):
    # keys: parsable ("7"), unparsable prefix form ("2-HIGH"), and NULL;
    # duplicate rows so per-group counts exceed 1
    data = [
        ("7", 1),
        ("7", 2),
        ("2-HIGH", 3),
        ("2-HIGH", 4),
        ("2-HIGH", 5),
        (None, 6),
        (None, 7),
    ]
    return local_rows_df(spark, data, "k string, x int")


def test_groupkey_trycast_postagg_equivalence(spark):
    df = _rows(spark)
    f_key = F.col("k").try_cast("int")  # fails for "2-HIGH", NULL for NULL

    # reference: the per-row form q38/q125 used before round 12
    ref = {
        r["k"]: (r["c"], r["f"])
        for r in df.groupBy("k")
        .agg(F.count(f_key).alias("c"), F.first(f_key).alias("f"))
        .collect()
    }
    # rewritten: evaluate the key-derived cast once per group, post-agg
    new = {
        r["k"]: (r["c"], r["f"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(
            "k",
            F.when(f_key.isNotNull(), F.col("n"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("c"),
            f_key.alias("f"),
        )
        .collect()
    }
    assert ref == new
    # the proof's edges actually occurred: a NULL-key group and a
    # failing-cast group both count 0; the parsable group counts all rows
    assert new[None] == (0, None)
    assert new["2-HIGH"] == (0, None)
    assert new["7"] == (2, 7)


def test_countmin_cells_from_counts_equivalence(spark):
    from highs_duckdb_spark.operators.text3 import _CM_D, _cm_bucket_spark

    toks = local_rows_df(
        spark,
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)],
        "tok string",
    )
    rb = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket_spark(r).alias("bucket"))
            for r in range(_CM_D)
        ]
    )
    # reference: hash every token INSTANCE into its cells (pre-round-12)
    ref = {
        (r["r"], r["bucket"]): r["c"]
        for r in toks.select(F.explode(rb).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    # rewritten: hash each DISTINCT token once, weight by its count
    new = {
        (r["r"], r["bucket"]): r["c"]
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .select("n", F.explode(rb).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("n").alias("c"))
        .collect()
    }
    assert ref == new
    assert sum(ref.values()) == 6 * _CM_D  # every instance lands in d cells
