"""Round-2 breadth operators: window-function extras, schema-on-read JSON,
string-distance blocking, and batch sessionization.

Each entry is the Spark-idiomatic form of a pattern the reference's host
engine (DuckDB) serves its users out of the box; scale notes inline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table


@register(
    "q34_window_extras",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(1e-9 + percent_rank() OVER w, 6) AS pct_rank,
           CAST(nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    doc=(
        "Window extras: ntile quartiles, percent_rank, and full-frame "
        "nth_value per market segment — one shuffle on the partition key, "
        "unique-key tiebreak so both engines rank identically."
    ),
)
def q34_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.lit(1e-9) + F.percent_rank().over(w), 6).alias("pct_rank"),
        F.nth_value("c_custkey", 2).over(w_full).cast("bigint").alias("second_richest"),
    ).orderBy("c_custkey")


@register(
    "q56_json_schema_struct",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_max,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=(
        "Schema-on-read JSON: from_json parses props into a typed struct "
        "ONCE at the scan (vs per-access json_extract string walks), then "
        "ordinary typed aggregation — at 100 TB, parse-once matters."
    ),
)
def q56_json_schema_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    parsed = events.select(
        "event_type", F.from_json(F.col("props"), "k INT").getField("k").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("k_sum"),
            F.max("k").cast("bigint").alias("k_max"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "t07_levenshtein_near_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY name_a, name_b
    """,
    category="text",
    doc=(
        "Edit-distance near-duplicate names: distinct-name self-join with a "
        "length-difference blocking predicate before the quadratic "
        "levenshtein — at scale, blocking keys (length bucket, first token) "
        "become the join key so the cross product never materializes."
    ),
)
def t07_levenshtein_near_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            ),
        )
        .filter(F.levenshtein("name_a", "name_b") <= 4)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )


@register(
    "q59_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc=(
        "Batch gap-sessionization (30-min) via lag + running-sum window — "
        "the classic two-window + aggregate plan, one shuffle on user_id "
        "reused by both windows and the groupBy. The streaming twin is "
        "qs03 (applyInPandasWithState); closed sessions agree."
    ),
)
def q59_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir).select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.select(
        "user_id",
        "ts",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag(F.col("ts")).over(w)) > 30 * 60,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q35_median_percentiles",
    oracle="""
    SELECT c_nationkey,
           round(1e-9 + median(c_acctbal), 4) AS median_bal,
           round(1e-9 + quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(1e-9 + quantile_cont(c_acctbal, 0.9), 4) AS p90,
           count(*) AS n
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc=(
        "Exact median + interpolated quantiles per group: both engines use "
        "linear interpolation (percentile_cont semantics), so values agree "
        "bitwise on the 2-decimal money grid."
    ),
)
def q35_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.round(F.lit(1e-9) + F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
            F.round(F.lit(1e-9) + F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
            F.round(F.lit(1e-9) + F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
            F.count("*").alias("n"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q57_map_functions",
    oracle="""
    WITH counts AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases,
             count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(clicks AS BIGINT) AS clicks,
           CAST(purchases AS BIGINT) AS purchases,
           CAST(n_types AS BIGINT) AS n_types
    FROM counts
    WHERE user_id < 50
    ORDER BY user_id
    """,
    doc=(
        "Map-typed analytics: per-user event_type→count map built with "
        "map_from_entries(collect_list(...)), probed with element_at and "
        "sized with map_keys — the Spark plan carries a real MapType column "
        "(the oracle states the same answer with conditional counts)."
    ),
)
def q57_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    per_type = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("n")))
        ).alias("type_counts")
    )
    return with_map.select(
        "user_id",
        F.coalesce(F.element_at(F.col("type_counts"), F.lit("click")), F.lit(0))
        .cast("bigint")
        .alias("clicks"),
        F.coalesce(F.element_at(F.col("type_counts"), F.lit("purchase")), F.lit(0))
        .cast("bigint")
        .alias("purchases"),
        F.size(F.map_keys(F.col("type_counts"))).cast("bigint").alias("n_types"),
    ).orderBy("user_id")


@register(
    "q38_error_safe_casts",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS BIGINT)) AS BIGINT) AS priority_sum,
           count(TRY_CAST(split_part(o_orderpriority, '-', 2) AS INTEGER)) AS numeric_suffixes,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / nullif(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0), 4) AS price_per_f
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Error-safe expressions under ANSI mode: try_cast for strings that "
        "may not parse, try_divide (÷0 → NULL, not an exception) — the "
        "ANSI-strict engine still runs dirty-data pipelines declaratively."
    ),
)
def q38_error_safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    prio_num = F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).try_cast("int")
    # suffix_num is a deterministic function of the GROUP KEY, and its
    # try_cast FAILS on every row ("URGENT" is not an int): under ANSI a
    # failing string→int cast constructs a formatted JVM error per row
    # (~9 µs measured — count(try_cast(key)) 1.40 s vs count(*) 0.16 s on
    # 150k rows at sf0.1), so it is evaluated ONCE PER GROUP on the
    # aggregated output instead of once per row (guide §1.2 per-task
    # work). Exact equivalence: within a group the key is constant, so
    # count(f(key)) = count(*) if f(key) IS NOT NULL else 0 — including
    # the NULL-key group (f(NULL) = NULL → 0 either way).
    suffix_num = F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).try_cast("int")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(prio_num.cast("bigint")).cast("bigint").alias("priority_sum"),
            F.count("*").alias("__n"),
            F.round(
                F.lit(1e-9)
                + F.try_divide(
                    F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"),
                    F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)),
                ),
                4,
            ).alias("price_per_f"),
        )
        .select(
            "o_orderpriority",
            "priority_sum",
            F.when(suffix_num.isNotNull(), F.col("__n"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("numeric_suffixes"),
            "price_per_f",
        )
        .orderBy("o_orderpriority")
    )


Z_THRESHOLD = 2.5


@register(
    "dq01_zscore_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT c_mktsegment AS seg,
             count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sx,
             -- sum of squared cents overflows BIGINT beyond ~sf0.001;
             -- DuckDB's sum(BIGINT) widens to HUGEINT, Spark side uses DECIMAL
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                      * CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxx
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    ),
    z AS (
      SELECT o_orderkey, c_mktsegment AS seg,
             (o_totalprice - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS zscore
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN stats ON stats.seg = c_mktsegment
    )
    SELECT o_orderkey, seg, round(1e-9 + zscore, 4) AS zscore
    FROM z WHERE abs(zscore) > {Z_THRESHOLD}
    ORDER BY o_orderkey
    """,
    category="quality",
    doc=(
        "Data-quality outlier detection: per-segment z-scores of order "
        "totals with |z| > 2.5 flagged. Mean and variance derive from "
        "exact integer-cents sums (sum x, sum x^2 — one grouped pass, "
        "engine-exact), then one broadcast join of the 5-row stats table "
        "back onto the fact side; no second full-data pass for the "
        "variance and no stddev_samp (whose summation order is "
        "engine-dependent)."
    ),
)
def dq01_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("seg"), "o_totalprice"
    )
    c = cents("o_totalprice")
    stats = joined.groupBy("seg").agg(
        F.count("*").alias("n"),
        (F.sum(c).cast("double") / 100.0).alias("sx"),
        # squared cents reach ~2.5e15/row: a long sum overflows past ~1e3
        # rows/group, so this one aggregate takes the exact DECIMAL path
        # (the oracle's HUGEINT equivalent); both cast the same exact
        # integer to DOUBLE
        (F.sum((c * c).cast("decimal(28,0)")).cast("double") / 10000.0).alias("sxx"),
    )
    z = (
        joined.join(F.broadcast(stats), "seg")
        .select(
            "o_orderkey",
            "seg",
            (
                (F.col("o_totalprice") - F.col("sx") / F.col("n"))
                / F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
            ).alias("zscore"),
        )
    )
    return (
        z.filter(F.abs("zscore") > Z_THRESHOLD)
        .select("o_orderkey", "seg", F.round(F.lit(1e-9) + F.col("zscore"), 4).alias("zscore"))
        .orderBy("o_orderkey")
    )


@register(
    "q79_udaf_geomean",
    oracle="""
    SELECT o_orderpriority,
           round(1e-9 + exp(avg(ln(o_totalprice))), 4) AS geo_mean_price
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    category="functions",
    doc=(
        "Custom aggregate (UDAF) surface: per-group geometric mean via an "
        "Arrow-batched grouped-agg pandas UDF — the Spark-4 registration "
        "path for user aggregates (SURVEY §2.2 'UDAF registration APIs'). "
        "Numpy does the log-sum per group; the plan is a normal hash "
        "aggregate whose buffer is the UDF's partial state."
    ),
)
def q79_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from highs_duckdb_spark.session import ensure_shipped

    ensure_shipped(spark)

    def _mean_log(prices):
        # mean-of-logs matches the oracle's avg(ln(x)) up to summation
        # order; the 4-decimal round absorbs the difference
        return float(np.log(prices.to_numpy(dtype="float64")).mean())

    # real type objects: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's signature inference rejects
    _mean_log.__annotations__ = {"prices": pd.Series, "return": float}
    geo_mean = F.pandas_udf(_mean_log, "double")

    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        # a grouped-agg pandas UDF cannot share an agg() with built-in
        # aggregates (INVALID_PANDAS_UDF_PLACEMENT), so it stands alone
        .agg(
            F.round(F.lit(1e-9) + F.exp(geo_mean(F.col("o_totalprice"))), 4).alias(
                "geo_mean_price"
            )
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q36_range_interval_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(1e-9 + CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0, 4)
             AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc=(
        "Time-based RANGE window frame: per user, rolling count/sum over "
        "the trailing hour BY EVENT TIME (value-based frame bounds, not row "
        "counts — irregular event spacing means ROWS frames cannot express "
        "this). One shuffle on user_id; the frame is evaluated with a "
        "sliding aggregate over the sorted partition."
    ),
)
def q36_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    ev = load_table(spark, "events", sf_dir)
    # exact integer MICROSECONDS on both engines: whole-second epochs
    # diverge on fractional-second timestamps (Spark's unix_timestamp
    # floors, DuckDB's epoch()::BIGINT rounds — an event pair exactly one
    # frame-width apart then flips in/out of the frame; caught at sf0.1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch"),
            cents("value").alias("vc"),
        )
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).cast("bigint").alias("n_last_hour"),
            F.round(
                F.lit(1e-9) + F.sum("vc").over(w).cast("double") / 100.0, 4
            ).alias("value_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q37_exact_correlation",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                      * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round(1e-9 + (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS price_discount_corr
    FROM m ORDER BY flag
    """,
    doc=(
        "Pearson correlation from exact integer-cents moments (n, Σx, Σy, "
        "Σx², Σy², Σxy in one grouped pass) — native corr() merges partial "
        "states in partition order and is not reproducible across engines; "
        "the moments form is exact, order-free, and still one shuffle."
    ),
)
def q37_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    li = load_table(spark, "lineitem", sf_dir)
    x = cents("l_extendedprice")
    y = cents("l_discount")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        # squared-cents sums overflow BIGINT (see dq01): exact DECIMAL path
        F.sum((x * x).cast("decimal(28,0)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,0)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(28,0)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        m.select(
            "flag",
            n.cast("bigint").alias("n"),
            F.round(F.lit(1e-9) + corr, 6).alias("price_discount_corr"),
        )
        .transform(present_sorted, "flag")
    )


@register(
    "q58_hierarchical_time_rollup",
    oracle="""
    WITH minute AS (
      SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events GROUP BY m
    ),
    hour AS (
      SELECT CAST(date_trunc('hour', m) AS TIMESTAMP) AS h,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(vc) AS BIGINT) AS vc,
             count(*) AS n_minutes_active
      FROM minute GROUP BY h
    )
    SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(1e-9 + CAST(sum(vc) AS DOUBLE) / 100.0, 4) AS total_value,
           count(*) AS n_hours_active,
           CAST(sum(n_minutes_active) AS BIGINT) AS n_minutes_active
    FROM hour GROUP BY day ORDER BY day
    """,
    doc=(
        "Hierarchical time-bucket rollup (the hypertable/continuous-"
        "aggregate pattern): minute buckets aggregate the raw scan ONCE; "
        "hourly and daily levels re-aggregate the level below, never the "
        "raw data — at 100 TB the raw table is read one time and each "
        "coarser resolution costs only a re-agg of the (tiny) finer one. "
        "Exact integer-cents sums compose losslessly across levels."
    ),
)
def q58_hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    ev = load_table(spark, "events", sf_dir)
    minute = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count("*").alias("n"), F.sum(cents("value")).alias("vc")
    )
    hour = minute.groupBy(F.date_trunc("hour", "m").alias("h")).agg(
        F.sum("n").alias("n"),
        F.sum("vc").alias("vc"),
        F.count("*").alias("n_minutes_active"),
    )
    return (
        hour.groupBy(F.date_trunc("day", "h").alias("day"))
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(F.lit(1e-9) + F.sum("vc").cast("double") / 100.0, 4).alias(
                "total_value"
            ),
            F.count("*").alias("n_hours_active"),
            F.sum("n_minutes_active").cast("bigint").alias("n_minutes_active"),
        )
        .transform(present_sorted, "day")
    )
