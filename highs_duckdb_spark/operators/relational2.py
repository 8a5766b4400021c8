"""Advanced relational operators: temporal joins (as-of, range), time-series
gap filling, PIVOT, regexp, date arithmetic, ordered-set aggregation, and
bag-semantics set ops.

The as-of join is the flagship "operator Spark lacks" case (SURVEY-class
custom operator): instead of a pairwise inequality join (quadratic per key),
it is implemented as the scalable union-and-carry pattern — tag both sides,
union, one shuffle on (key, time), then `last(..., ignorenulls)` over an
unbounded-preceding window carries the most recent left-side value forward.
Cost: one sort-shuffle, zero join explosion — the same plan Flink/kdb-style
engines use for temporal joins at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.plans.strategy import fact_join_strategy
from highs_duckdb_spark.session import load_table, local_rows_df


@register(
    "q80_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 'p' AS side FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 'v' AS side FROM events WHERE event_type = 'view'
    ),
    carried AS (
      SELECT user_id, ts, event_id, side,
             last_value(CASE WHEN side = 'v' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side DESC, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_ts
      FROM tagged
    )
    SELECT user_id, event_id AS purchase_event_id, last_view_ts,
           CAST(CASE WHEN last_view_ts IS NULL THEN -1
                ELSE date_diff('second', last_view_ts, ts) END AS BIGINT) AS secs_since_view
    FROM carried WHERE side = 'p'
    ORDER BY user_id, purchase_event_id
    """,
    category="relational",
    doc=(
        "AS-OF JOIN: each purchase matched to the user's most recent "
        "prior-or-simultaneous view — union + carry-forward window, one "
        "shuffle, no pairwise join."
    ),
)
def q80_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # ONE scan of the fact: tag sides with a CASE instead of union-of-two-
    # filtered-scans (the oracle's UNION ALL of two SELECTs over the same
    # table is semantically identical; at 100 TB one pass vs two matters)
    tagged = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("p"))
        .otherwise(F.lit("v"))
        .alias("side"),
    )
    # 'v' sorts after 'p' descending → a view at the exact same ts is carried
    # into the purchase row (ties: view wins), matching the oracle's ORDER BY
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("side").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_view_ts",
        F.last(F.when(F.col("side") == "v", F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("side") == "p")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            "last_view_ts",
            F.when(F.col("last_view_ts").isNull(), F.lit(-1))
            .otherwise(
                (F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts"))
            )
            .cast("bigint")
            .alias("secs_since_view"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


@register(
    "q81_range_join",
    oracle="""
    WITH windows(win_id, win_start, win_end) AS (VALUES
      (1, TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
      (2, TIMESTAMP '2024-01-12 06:00:00', TIMESTAMP '2024-01-13 18:00:00'),
      (3, TIMESTAMP '2024-01-20 00:00:00', TIMESTAMP '2024-01-25 00:00:00'))
    SELECT CAST(win_id AS BIGINT) AS win_id, event_type, count(*) AS n
    FROM windows JOIN events ON ts >= win_start AND ts < win_end
    GROUP BY win_id, event_type
    ORDER BY win_id, event_type
    """,
    category="relational",
    doc=(
        "Range (interval containment) join: events against time windows — "
        "broadcast the interval table, range predicates evaluate stream-side."
    ),
)
def q81_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    windows = local_rows_df(spark, 
        [
            (1, "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
            (2, "2024-01-12 06:00:00", "2024-01-13 18:00:00"),
            (3, "2024-01-20 00:00:00", "2024-01-25 00:00:00"),
        ],
        "win_id long, win_start string, win_end string",
    ).select(
        "win_id",
        F.col("win_start").cast("timestamp").alias("win_start"),
        F.col("win_end").cast("timestamp").alias("win_end"),
    )
    return (
        ev.join(
            F.broadcast(windows),
            (ev.ts >= windows.win_start) & (ev.ts < windows.win_end),
        )
        .groupBy("win_id", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("win_id", "event_type")
    )


@register(
    "q82_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1 FROM events
    ),
    days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT day, event_type FROM days CROSS JOIN types),
    actual AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n
      FROM events WHERE event_type IN ('signup', 'error') GROUP BY day, event_type
    )
    SELECT g.day, g.event_type, CAST(coalesce(a.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN actual a ON g.day = a.day AND g.event_type = a.event_type
    WHERE g.event_type IN ('signup', 'error')
    ORDER BY g.day, g.event_type
    """,
    category="relational",
    doc=(
        "Time-series gap filling: dense day grid via sequence()/explode "
        "cross-joined with the key domain, left-joined to actuals, zeros "
        "filled — the hypertable-rollup pattern."
    ),
)
def q82_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = ev.select("event_type").distinct().filter(
        F.col("event_type").isin("signup", "error")
    )
    grid = days.crossJoin(F.broadcast(types))
    actual = (
        ev.filter(F.col("event_type").isin("signup", "error"))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    return (
        grid.join(actual, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"))
        .orderBy("day", "event_type")
    )


@register(
    "q83_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           round(1e-9 + CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS f_total,
           round(1e-9 + CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS o_total,
           round(1e-9 + CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS p_total
    FROM orders GROUP BY yr ORDER BY yr
    """,
    category="relational",
    doc="Native PIVOT (status → columns) with explicit value list (no extra distinct pass).",
)
def q83_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    pivoted = (
        orders.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.round(
                F.lit(1e-9) + F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"),
                2,
            )
        )
    )
    return pivoted.select(
        "yr",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    ).orderBy("yr")


@register(
    "q84_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
           regexp_matches(p_name, '^(red|blue|green)') AS has_color,
           regexp_replace(p_name, '\\d+', '#', 'g') AS name_masked
    FROM part WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
    category="relational",
    doc="Regexp battery: extract with group, boolean match, global replace.",
)
def q84_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey",
        F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).cast("bigint").alias("brand_num"),
        F.col("p_name").rlike(r"^(red|blue|green)").alias("has_color"),
        F.regexp_replace(F.col("p_name"), r"\d+", "#").alias("name_masked"),
    ).orderBy("p_partkey")


@register(
    "q85_date_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_days,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END AS BIGINT) AS late
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    category="relational",
    doc="Date arithmetic: day diffs, interval addition, lateness flags across a join.",
)
def q85_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 200)
    li = load_table(spark, "lineitem", sf_dir)
    due = F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    return (
        F.broadcast(orders).join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("bigint").alias(
                "ship_days"
            ),
            due.alias("due_date"),
            F.when(F.col("l_shipdate") > due, 1).otherwise(0).cast("bigint").alias("late"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q86_first_last_window",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type)  OVER w AS last_event,
           CAST(count(*) OVER w AS BIGINT) AS n_events
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    category="relational",
    doc="FIRST_VALUE/LAST_VALUE over full-partition frames (journey endpoints per user).",
)
def q86_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_event"),
            F.last("event_type").over(w).alias("last_event"),
            F.count("*").over(w).cast("bigint").alias("n_events"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "q87_array_agg",
    oracle="""
    SELECT n_regionkey AS regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    ORDER BY regionkey
    """,
    category="relational",
    doc="Ordered-set aggregation: collect_list → sort → join (deterministic array_agg).",
)
def q87_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    return (
        nation.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("regionkey")
    )


@register(
    "q88_union_all_bag_ops",
    oracle="""
    SELECT kind, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT 'all' AS kind, l_partkey FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        UNION ALL
        SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
      )
      UNION ALL
      SELECT 'intersect_all', l_partkey FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
      )
      UNION ALL
      SELECT 'except_all', l_partkey FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
      )
    ) GROUP BY kind ORDER BY kind
    """,
    category="relational",
    doc="Bag-semantics set algebra: UNION ALL / INTERSECT ALL / EXCEPT ALL cardinalities.",
)
def q88_union_all_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    a = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    b = li.filter(F.col("l_discount") > 0.08).select("l_partkey")
    parts = [
        a.unionAll(b).withColumn("kind", F.lit("all")),
        a.intersectAll(b).withColumn("kind", F.lit("intersect_all")),
        a.exceptAll(b).withColumn("kind", F.lit("except_all")),
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy("kind").agg(F.count("*").alias("n")).orderBy("kind")


@register(
    "q89_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS term
      FROM documents
    ),
    tf AS (
      SELECT d.doc_id, t.term,
             CAST(length(list_filter(regexp_split_to_array(lower(trim(d.text)), '\\s+'),
                                     x -> x = t.term)) AS DOUBLE) AS tf
      FROM documents d JOIN tokens t ON d.doc_id = t.doc_id
    ),
    df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tokens GROUP BY term),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(1e-9 + tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term AS top_term, tfidf FROM ranked WHERE rk = 1
    ORDER BY doc_id
    """,
    category="text",
    doc=(
        "TF-IDF: explode distinct terms, per-term document frequency, "
        "ln(N/df) weighting, top-1 term per doc — explode + two aggregations "
        "+ ranking window, all builtins."
    ),
)
def q89_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    exploded = docs.select("doc_id", F.explode(toks).alias("term"))
    tf = exploded.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dfreq = (
        exploded.distinct().groupBy("term").agg(F.count("*").cast("double").alias("df"))
    )
    # lazy corpus size (1-row aggregate crossJoined in), like the oracle's CTE —
    # keeps the builder free of eager jobs
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.lit(1e-9) + F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
        .orderBy("doc_id")
    )


@register(
    "q90_approx_percentile",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority, o_totalprice
        FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
    )
    SELECT o_orderpriority,
           round(1e-9 + quantile_cont(o_totalprice, 0.5), 4) AS p50_approx,
           round(1e-9 + quantile_cont(o_totalprice, 0.9), 4) AS p90_approx
    FROM s GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    category="relational",
    doc=(
        "Approximate percentiles via a DETERMINISTIC 10% hash-Bernoulli "
        "sample (md5 of the row key — reproducible across engines AND runs, "
        "which RNG-seeded sketches are not), exact interpolated percentile "
        "on the sample. Hash-checked against DuckDB running the identical "
        "estimator; the engine-native t-digest path is "
        "q173_native_approx_percentile, the exact twin q62_percentiles. At "
        "scale the sample predicate is evaluated at the scan (no shuffle "
        "grows with the unsampled fact)."
    ),
)
def q90_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    keep = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
        == 0
    )
    return (
        orders.filter(keep)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.lit(1e-9) + F.percentile("o_totalprice", F.lit(0.5)), 4
            ).alias("p50_approx"),
            F.round(
                F.lit(1e-9) + F.percentile("o_totalprice", F.lit(0.9)), 4
            ).alias("p90_approx"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q91_tablesample",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sampled
    FROM lineitem
    WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                              || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    category="relational",
    doc=(
        "Bernoulli table sampling via a DETERMINISTIC md5 hash of the row "
        "key (10% where hash%10=0) — the production-grade way to sample "
        "training data because membership is stable across engines, runs "
        "and re-partitions, so the sample is auditable (and hash-checked "
        "here). The RNG-seeded TABLESAMPLE path is "
        "q174_native_rng_tablesample."
    ),
)
def q91_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    keep = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
        == 0
    )
    return (
        li.filter(keep)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("l_returnflag")
    )


@register(
    "q173_native_approx_percentile",
    oracle=None,  # sketch-based estimates are engine-specific; bounds asserted in pytest
    category="relational",
    doc=(
        "Engine-native approx_percentile (quantile sketch) per group — "
        "pytest-only; the cross-engine-checkable estimator is "
        "q90_approx_percentile, the exact twin q62_percentiles."
    ),
    driver_visible=False,
)
def q173_native_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("p50_approx"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(1000)).alias("p90_approx"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q174_native_rng_tablesample",
    oracle=None,  # RNG sampling is engine-specific by nature; statistical bounds in pytest
    category="relational",
    doc=(
        "Bernoulli TABLESAMPLE with a fixed seed (deterministic within "
        "Spark only) — pytest-only; the cross-engine-auditable sampler "
        "is q91_tablesample, the deterministic stratified twin p04."
    ),
    driver_visible=False,
)
def q174_native_rng_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("l_returnflag")
    )


@register(
    "q92_stratified_sample",
    oracle=None,
    category="relational",
    doc=(
        "Stratified sampling (sampleBy): per-stratum fractions with a fixed "
        "seed — pytest-only (engine-specific RNG); the deterministic "
        "hash-checked stratified twin is p04_stratified_sample."
    ),
    driver_visible=False,
)
def q92_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.1, "4-NOT SPECIFIED": 0.1, "5-LOW": 0.05}
    return (
        orders.sampleBy("o_orderpriority", fractions, seed=7)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("o_orderpriority")
    )


N_SALTS = 8


@register(
    "q93_salted_skew_join",
    oracle="""
    WITH skewed AS (
      SELECT CASE WHEN l_suppkey < 5 THEN 0 ELSE l_suppkey END AS skew_key,
             l_extendedprice
      FROM lineitem
    ),
    dim AS (SELECT s_suppkey, s_name FROM supplier)
    SELECT s_name, count(*) AS n,
           round(1e-9 + CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
    FROM skewed JOIN dim ON skew_key = s_suppkey
    GROUP BY s_name ORDER BY s_name
    """,
    category="relational",
    doc=(
        "Salted join for skewed keys: the hot key's rows spread across "
        "N_SALTS sub-partitions (salt = deterministic hash of a unique "
        "column), the dim side replicated once per salt — the manual "
        "mitigation AQE's skew-join automates, shown explicitly. Result "
        "identical to the plain join."
    ),
)
def q93_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    # synthesize a hot key: fold suppkeys 0-4 into key 0 (~5% of all rows)
    skewed = li.select(
        F.when(F.col("l_suppkey") < 5, 0).otherwise(F.col("l_suppkey")).alias("skew_key"),
        "l_extendedprice",
        (F.pmod(F.col("l_orderkey"), F.lit(N_SALTS))).alias("salt"),  # deterministic salt
    )
    salts = spark.range(N_SALTS).select(F.col("id").alias("salt"))
    dim_replicated = sup.crossJoin(F.broadcast(salts))
    # strategy hint: salting exists precisely because the dim CANNOT broadcast
    # (if it could, you would broadcast and skip salting entirely) — force
    # the co-partitioned (key, salt) shuffle the technique is demonstrating,
    # at every scale factor.
    return (
        skewed.join(
            dim_replicated.hint(fact_join_strategy(sf_dir)),
            (skewed.skew_key == dim_replicated.s_suppkey) & (skewed.salt == dim_replicated.salt),
        )
        .groupBy("s_name")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("total"),
        )
        .orderBy("s_name")
    )
