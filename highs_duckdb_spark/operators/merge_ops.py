"""Delta-style MERGE (upsert) as a batch operator.

Spark without a table format that supports ``MERGE INTO`` still expresses
the operation exactly the way Delta/Iceberg compile it: a full outer join
of target and source on the merge key, then per-row CASE resolution
(matched → update, source-only → insert, target-only → keep). At 100 TB
the join is the whole cost: a full-outer join can never broadcast (both
sides must observe all rows), so it is one co-partitioned shuffle on the
merge key — a real lakehouse deployment adds file-level pruning via an
inner pre-join of source keys against file stats, which narrows the
target scan but keeps this plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table


@register(
    "q77_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT CASE WHEN o_custkey % 20 = 0 THEN o_custkey + 1000000
                  ELSE o_custkey END AS u_custkey,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      GROUP BY u_custkey
    )
    SELECT
      CAST(coalesce(c_custkey, u_custkey) AS BIGINT) AS custkey,
      coalesce(c_name, 'NEW_' || CAST(u_custkey AS VARCHAR)) AS name,
      round(1e-9 + CAST(
        CASE
          WHEN u_custkey IS NULL THEN CAST(c_acctbal AS DECIMAL(12,2))
          WHEN c_custkey IS NULL THEN spend * CAST(0.01 AS DECIMAL(4,2))
          ELSE CAST(c_acctbal AS DECIMAL(12,2)) + spend * CAST(0.01 AS DECIMAL(4,2))
        END AS DOUBLE), 2) AS acctbal,
      CASE WHEN u_custkey IS NULL THEN 'keep'
           WHEN c_custkey IS NULL THEN 'insert'
           ELSE 'update' END AS op
    FROM customer FULL OUTER JOIN updates ON c_custkey = u_custkey
    ORDER BY custkey
    """,
    category="sources",
    doc=(
        "MERGE upsert (Delta-semantics): CDC batch of per-customer spend "
        "(keys ending in 0 remapped to simulate inserts) full-outer-joined "
        "onto the customer dimension — matched rows get acctbal credited, "
        "unmatched source rows become inserts, unmatched target rows pass "
        "through; exact-decimal money math both engines."
    ),
)
def q77_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    updates = (
        orders.groupBy(
            F.when(
                F.col("o_custkey") % 20 == 0, F.col("o_custkey") + 1000000
            )
            .otherwise(F.col("o_custkey"))
            .alias("u_custkey")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("spend"))
    )
    credited = F.col("spend") * F.lit(0.01).cast("decimal(4,2)")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    # no broadcast hint: full-outer requires both sides shuffled on the key
    merged = cust.join(updates, cust.c_custkey == updates.u_custkey, "full_outer")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("u_custkey")).cast("bigint").alias("custkey"),
        F.coalesce(
            F.col("c_name"), F.concat(F.lit("NEW_"), F.col("u_custkey").cast("string"))
        ).alias("name"),
        F.round(
            F.lit(1e-9)
            + F.when(F.col("u_custkey").isNull(), bal)
            .when(F.col("c_custkey").isNull(), credited)
            .otherwise(bal + credited)
            .cast("double"),
            2,
        ).alias("acctbal"),
        F.when(F.col("u_custkey").isNull(), "keep")
        .when(F.col("c_custkey").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    ).orderBy("custkey")


@register(
    "q78_scd2_history",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id, ts, value
      FROM events WHERE event_type = 'signup' OR event_type = 'purchase'
    )
    SELECT user_id,
           event_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
           round(1e-9 + value, 4) AS state_value,
           CAST(lead(ts) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
    category="merge",
    doc=(
        "Type-2 slowly-changing-dimension history build: each change event "
        "opens a validity interval closed by the user's next change "
        "(valid_to NULL = current row) — the warehouse pattern that turns a "
        "CDC/event stream into point-in-time queryable history. One window "
        "over the change key; at 100 TB this is a single shuffle on "
        "user_id, and incremental maintenance is the q77 MERGE."
    ),
)
def q78_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return scd2_intervals(ev).orderBy("user_id", "valid_from", "event_id")


def scd2_intervals(events: DataFrame) -> DataFrame:
    """The ONE SCD2 validity-interval derivation (shared by q78, the q151
    point-in-time join, and pinned equal to qs12's streaming rebuild):
    signup/purchase changes per user, each opening an interval closed by
    the user's next change, rounded state value, (ts, event_id) tiebreak."""
    ch = events.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ch.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.round(F.lit(1e-9) + F.col("value"), 4).alias("state_value"),
        nxt.isNull().alias("is_current"),
    )
