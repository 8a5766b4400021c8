"""Round-2 additions: skyline, trailing EWMA, sweep-line concurrency,
rank-statistic AUC, weighted median, and a bucketed band join.

Each is a classic OLAP/analytics operator the reference's host engine
(DuckDB) can express but that needs a deliberately different *physical*
shape to survive 100 TB — the Spark builder uses the scalable formulation
and the DuckDB oracle pins the semantics (often via the naive quadratic
form, e.g. the skyline's NOT EXISTS and the band join's inequality join).

Determinism: every float output follows the registry conventions
(round(1e-9 + x, k), explicit BIGINT casts, unique-key tiebreaks); the
sweep-line and weighted-median outputs are exact integers end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.functions.presentation import ordered_wide, present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.plans.strategy import fact_hint
from highs_duckdb_spark.session import load_table

_US_PER_DAY = 86_400_000_000
_US_PER_MIN = 60_000_000


@register(
    "q135_skyline_pareto",
    oracle="""
    SELECT a.p_partkey, a.p_retailprice, CAST(a.p_size AS BIGINT) AS p_size
    FROM part a WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    ORDER BY a.p_partkey
    """,
    doc=(
        "2-D skyline (Pareto frontier: minimize price, maximize size). The "
        "oracle is the textbook O(n²) NOT-EXISTS dominance query; the Spark "
        "plan is linear: aggregate max size per distinct price, one running-"
        "max window over that (distinct-price-sized) table, then a broadcast "
        "join back — a row is dominated iff a strictly cheaper price reaches "
        "its size, or its own price level holds a strictly larger size. At "
        "100 TB the fact table is scanned twice and the only single-partition "
        "work is the price-cardinality running max (catalog-bounded)."
    ),
)
def q135_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_size", "p_retailprice")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("max_sz"))
    w = Window.orderBy("p_retailprice")
    levels = per_price.withColumn(
        "best_lt",
        F.lag(
            F.max("max_sz").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).over(w),
    )
    dominated = (F.coalesce(F.col("best_lt") >= F.col("p_size"), F.lit(False))) | (
        F.col("max_sz") > F.col("p_size")
    )
    return (
        part.join(F.broadcast(levels), "p_retailprice")
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size"))
        .transform(present_sorted, "p_partkey")
    )


@register(
    "q136_ewma_trailing",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
      FROM events)
    SELECT user_id, event_id,
           round(1e-9 + list_sum(list_transform(vals, (v, i) -> v * pow(0.7, len(vals) - i)))
                 / ((1 - pow(0.7, len(vals))) / 0.3), 4) AS ewma
    FROM e ORDER BY user_id, event_id
    """,
    doc=(
        "Trailing exponentially weighted moving average (α=0.3, 20-row "
        "frame) per user. Both engines evaluate the identical oldest→newest "
        "weighted sum over the window frame's value list (Spark: "
        "collect_list + zip_with/aggregate higher-order functions, all "
        "JVM-side; DuckDB: list() window + indexed-lambda list_transform); "
        "the normalizer is the closed-form geometric series. One shuffle on "
        "user_id; frame bounded at 20 rows so state never grows with "
        "history length."
    ),
)
def q136_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    frame = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    )
    vals = F.collect_list("value").over(frame)
    n = F.size(vals)
    weighted = F.zip_with(
        vals,
        F.sequence(F.lit(1), n),
        lambda v, i: v * F.pow(F.lit(0.7), (n - i).cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = (F.lit(1.0) - F.pow(F.lit(0.7), n.cast("double"))) / F.lit(0.3)
    return (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("ewma", F.round(F.lit(1e-9) + num / den, 4))
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")
    )


@register(
    "q137_concurrency_sweepline",
    oracle="""
    WITH iv AS (SELECT epoch_us(ts) AS s,
                       epoch_us(ts) + CAST(floor(value*100 + 0.5) AS BIGINT)*10000 AS e
                FROM events),
    spans AS (SELECT unnest(generate_series(s // 86400000000, (e-1) // 86400000000)) AS day,
                     s, e FROM iv),
    pts AS (SELECT day, greatest(s, day*86400000000) AS t, 1 AS delta FROM spans
            UNION ALL SELECT day, least(e, (day+1)*86400000000), -1 FROM spans),
    runs AS (SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM pts)
    SELECT CAST(make_timestamp(day*86400000000) AS DATE) AS day,
           CAST(max(run) AS BIGINT) AS max_concurrent
    FROM runs GROUP BY day ORDER BY day
    """,
    doc=(
        "Peak concurrent sessions per day via a sweep line: each event is an "
        "interval [ts, ts + `value` seconds) in exact µs, split at "
        "midnight into per-day segments (≤2 per interval: durations are "
        "bounded), unpivoted to ±1 boundary points, running-summed inside "
        "each day partition. Replaces the quadratic overlap self-join with "
        "one explode + one day-partitioned window; day partitioning keeps "
        "the sweep parallel at 100 TB (no global ordering). Exact integer "
        "arithmetic end-to-end; half-open intervals order -1 before +1 at "
        "boundary instants in both engines."
    ),
)
def q137_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    iv = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") * 10000
        ).alias("e"),
    )
    day = F.col("day")
    # `div` is exact integer division (a double `/` + cast could misfloor
    # a quotient that lands within an ulp of an integer boundary).
    # Degenerate intervals (e <= s, possible when value rounds to 0) make
    # d1 < d0: DuckDB's generate_series(d0, d1) is then EMPTY, but Spark's
    # sequence would count DOWN and fabricate spans — emit an empty array
    # explicitly so both engines drop the interval.
    d0 = F.expr(f"s div {_US_PER_DAY}")
    d1 = F.expr(f"(e - 1) div {_US_PER_DAY}")
    spans = iv.select(
        F.explode(
            F.when(d1 >= d0, F.sequence(d0, d1)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("day"),
        "s",
        "e",
    )
    pts = spans.select(
        day, F.greatest("s", day * _US_PER_DAY).alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            day, F.least("e", (day + 1) * _US_PER_DAY).alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = Window.partitionBy("day").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        pts.withColumn("run", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("run").alias("max_concurrent"))
        .select(
            F.to_date(F.timestamp_micros(F.col("day") * _US_PER_DAY)).alias("day"),
            "max_concurrent",
        )
        .transform(present_sorted, "day")
    )


@register(
    "q138_auc_mann_whitney",
    oracle="""
    WITH per AS (
      SELECT value AS score, count(*) AS n_all,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pos
      FROM events GROUP BY value),
    ranked AS (
      SELECT score, n_all, n_pos,
             coalesce(sum(n_all) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM per),
    tot AS (SELECT sum(n_pos) AS np, sum(n_all) - sum(n_pos) AS nn FROM per),
    num AS (SELECT sum(CAST(n_pos AS DOUBLE)
                       * (CAST(cum_before AS DOUBLE) + (CAST(n_all AS DOUBLE) + 1)/2)) AS s
            FROM ranked)
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round(1e-9 + (s - CAST(np AS DOUBLE)*(CAST(np AS DOUBLE)+1)/2)
                 / (CAST(np AS DOUBLE)*CAST(nn AS DOUBLE)), 6) AS auc
    FROM tot, num
    """,
    doc=(
        "Binary-classifier ROC AUC as the Mann-Whitney rank statistic with "
        "midrank tie correction (label: event_type='purchase', score: "
        "value). Scalable shape: aggregate counts per distinct score first, "
        "so the ranking window runs over score-cardinality rows, never the "
        "fact table — the same per-group-then-window pattern as the Zipf "
        "fit (t13). All rank sums are exact multiples of 0.5 in double, so "
        "the two engines agree bit-for-bit before the final division."
    ),
)
def q138_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    per = ev.groupBy(F.col("value").alias("score")).agg(
        F.count("*").alias("n_all"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_pos"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn("cum_before", F.coalesce(F.sum("n_all").over(w), F.lit(0)))
    agg = ranked.agg(
        F.sum("n_pos").alias("np"),
        (F.sum("n_all") - F.sum("n_pos")).alias("nn"),
        F.sum(
            F.col("n_pos").cast("double")
            * (
                F.col("cum_before").cast("double")
                + (F.col("n_all").cast("double") + 1) / 2
            )
        ).alias("s"),
    )
    np_, nn = F.col("np").cast("double"), F.col("nn").cast("double")
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.round(
            F.lit(1e-9) + (F.col("s") - np_ * (np_ + 1) / 2) / (np_ * nn), 6
        ).alias("auc"),
    )


@register(
    "q139_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice,
             sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tot
      FROM lineitem)
    SELECT l_returnflag, min(l_extendedprice) AS weighted_median,
           CAST(min(tot) AS BIGINT) AS total_weight_cents
    FROM w WHERE 2*cum >= tot GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc=(
        "Quantity-weighted median price per return flag: cumulative weight "
        "window in exact integer cents, first row whose doubled cumulative "
        "weight reaches the group total (deterministic ties via the "
        "(price, orderkey, linenumber) sort key). Exact integers until the "
        "final price pick, so both engines agree bit-for-bit. The per-group "
        "sort is the exact algorithm's cost; at 100 TB the same query would "
        "swap to a two-pass bisection or a weighted percentile sketch — the "
        "cumulative-window formulation here is the oracle-exact form."
    ),
)
def q139_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    wt = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
    wcum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy("l_returnflag")
    return (
        li.select(
            "l_returnflag",
            "l_extendedprice",
            F.sum(wt).over(wcum).alias("cum"),
            F.sum(wt).over(wtot).alias("tot"),
        )
        .filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.min("tot").cast("bigint").alias("total_weight_cents"),
        )
        .transform(present_sorted, "l_returnflag")
    )


@register(
    "q140_bucketed_band_join",
    oracle="""
    SELECT e.event_id, CAST(count(*) - 1 AS BIGINT) AS n_nearby
    FROM events e JOIN events a
      ON a.ts BETWEEN e.ts - INTERVAL 60 SECOND AND e.ts + INTERVAL 60 SECOND
    WHERE e.event_type = 'error'
    GROUP BY e.event_id ORDER BY e.event_id
    """,
    doc=(
        "Fact-fact temporal band join (events within ±60 s of each error, "
        "no equi-key): the naive form is an inequality join — a broadcast "
        "nested loop in Spark, quadratic at scale (DuckDB's IEJoin runs it "
        "as the oracle). The Spark plan buckets time into 60 s bins, "
        "explodes each error to its 3 adjacent bins, equi-joins on the bin "
        "(co-partitioned shuffle, AQE skew-split armed for hot minutes), "
        "and applies the exact µs band filter after — every qualifying "
        "pair collides in exactly one bin, so no dedup is needed, and the "
        "guaranteed self-match keeps zero-neighbor errors in the output "
        "(count − 1)."
    ),
)
def q140_bucketed_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t"), "event_type"
    )
    err = base.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("t").alias("e_t"),
        F.explode(
            F.sequence(
                F.expr(f"t div {_US_PER_MIN}") - 1, F.expr(f"t div {_US_PER_MIN}") + 1
            )
        ).alias("bucket"),
    )
    allv = base.select(
        F.expr(f"t div {_US_PER_MIN}").alias("bucket"), F.col("t").alias("a_t")
    )
    return (
        err.join(fact_hint(allv, sf_dir), "bucket")
        .filter(F.abs(F.col("a_t") - F.col("e_t")) <= _US_PER_MIN)
        .groupBy(F.col("e_id").alias("event_id"))
        .agg((F.count("*") - 1).alias("n_nearby"))
        .transform(ordered_wide, "event_id")
    )


@register(
    "q141_running_distinct_users",
    oracle="""
    WITH flagged AS (
      SELECT event_id, event_type, ts,
             CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events)
    SELECT event_id, event_type,
           CAST(sum(is_first) OVER (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_users_so_far
    FROM flagged ORDER BY event_type, ts, event_id
    """,
    doc=(
        "Running COUNT(DISTINCT user) per event type — a windowed distinct "
        "aggregate neither engine supports directly; both run the classic "
        "rewrite: flag each (type, user)'s first occurrence with one "
        "window, running-sum the flags with a second. Two key-partitioned "
        "window shuffles, no distinct-state accumulation — the rewrite is "
        "what makes the operator feasible at 100 TB, where a per-row "
        "distinct set would be unbounded state."
    ),
)
def q141_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return (
        flagged.select(
            "event_id",
            "event_type",
            "ts",
            F.sum("is_first").over(w_run).cast("bigint").alias("distinct_users_so_far"),
        )
        .orderBy("event_type", "ts", "event_id")
        .drop("ts")
    )


@register(
    "q142_sequence_pattern_funnel",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(length(regexp_extract_all(
                  string_agg(left(event_type, 1), '' ORDER BY ts, event_id),
                  'vcp')) AS BIGINT) AS n_vcp
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "MATCH_RECOGNIZE-style sequence pattern count: per user, the "
        "time-ordered event-initial string (view/click/purchase/signup/"
        "error have distinct initials) is scanned for non-overlapping "
        "'view→click→purchase' runs. Spark builds the ordered string "
        "inside the aggregate (array_sort of (ts, event_id, initial) "
        "structs — no window pass needed) and counts with regexp_count; "
        "DuckDB uses ordered string_agg + regexp_extract_all. One shuffle "
        "on user_id; per-user state is the session string, bounded by "
        "per-key history like any sessionization."
    ),
)
def q142_sequence_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("i"),
                    )
                )
            ),
            lambda x: x["i"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.regexp_count(seq, F.lit("vcp")).cast("bigint").alias("n_vcp"),
        )
        .transform(present_sorted, "user_id")
    )
