"""Round-2 surface extensions: UNPIVOT, positional explode, correlated
LATERAL joins, bag-semantics set ops, and a one-pass column-completeness
profile.

Each is a construct DuckDB users reach for that wasn't yet represented in
the registry (q83 covers PIVOT; these cover its inverse and the lateral /
multiset corners). Scale notes inline per operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.presentation import ordered_wide, present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.plans.strategy import fact_join_strategy
from highs_duckdb_spark.session import load_table


@register(
    "q15_unpivot",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           measure, value
    FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                      l_discount, l_tax
               FROM lineitem WHERE l_orderkey < 200)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE value
    )
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    doc=(
        "UNPIVOT (wide→long melt) of the four lineitem measures — the "
        "inverse of q83's PIVOT. Spark's df.unpivot is a Generate (explode "
        "of a struct array) on the map side: no shuffle, output is "
        "4× the input rows with pruned columns."
    ),
)
def q15_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .transform(ordered_wide, "l_orderkey", "l_linenumber", "measure")
    )


@register(
    "q16_posexplode_ordinality",
    oracle="""
    SELECT p_partkey, CAST(gs - 1 AS BIGINT) AS pos, s[gs] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS s
          FROM part WHERE p_partkey < 500),
         LATERAL (SELECT unnest(generate_series(1, len(s))) AS gs) t
    ORDER BY p_partkey, pos
    """,
    doc=(
        "Positional explode (UNNEST WITH ORDINALITY): split p_name and keep "
        "each token's 0-based position. Map-side Generate; the position "
        "column is computed during the explode, not by a window."
    ),
)
def q16_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return (
        part.filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
        )
        .select("p_partkey", F.col("pos").cast("bigint").alias("pos"), "word")
        .transform(present_sorted, "p_partkey", "pos")
    )


# One SQL text serves both engines: Spark 4 and DuckDB share the correlated
# LATERAL syntax, and the DECIMAL sum keeps the ranking key exact on both
# (double sums differ in the last ulp between engines — never rank on them).
_Q17_SQL = """
    SELECT r_name, t.n_name,
           round(1e-9 + CAST(t.total_dec AS DOUBLE), 2) AS supplier_balance
    FROM region r,
    LATERAL (
      SELECT n_name, sum(CAST(s_acctbal AS DECIMAL(12,2))) AS total_dec
      FROM nation JOIN supplier ON s_nationkey = n_nationkey
      WHERE n_regionkey = r.r_regionkey
      GROUP BY n_name
      ORDER BY total_dec DESC, n_name
      LIMIT 2
    ) t
    ORDER BY r_name, supplier_balance DESC, n_name
"""


@register(
    "q17_lateral_topn",
    oracle=_Q17_SQL,
    doc=(
        "Correlated LATERAL subquery: per region, the top-2 nations by total "
        "supplier balance (per-group ORDER BY + LIMIT inside the lateral). "
        "Catalyst plans this as a join + per-key window rather than N "
        "re-executions; at scale it is the standard top-n-per-group shape."
    ),
)
def q17_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("region", "nation", "supplier"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


@register(
    "q18_bag_set_ops",
    oracle="""
    SELECT op, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT 'intersect_all' AS op, * FROM (
        (SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000)
        INTERSECT ALL
        (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
      )
      UNION ALL
      SELECT 'except_all' AS op, * FROM (
        (SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000)
        EXCEPT ALL
        (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
      )
    )
    GROUP BY op, o_orderpriority
    ORDER BY op, o_orderpriority
    """,
    doc=(
        "Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL — "
        "multiplicity-aware, unlike q40/q41's DISTINCT forms). Spark "
        "compiles both to an aggregate over tagged counts + generate: one "
        "shuffle on the value, no join."
    ),
)
def q18_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_totalprice") > 150000).select("o_orderpriority")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    tagged = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "*").unionAll(
        a.exceptAll(b).select(F.lit("except_all").alias("op"), "*")
    )
    return (
        tagged.groupBy("op", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .transform(present_sorted, "op", "o_orderpriority")
    )


@register(
    "q19_timezone_convert",
    oracle="""
    SELECT event_id,
           timezone('America/New_York', timezone('UTC', ts)) AS ts_ny,
           timezone('Asia/Tokyo', timezone('UTC', ts)) AS ts_tokyo,
           CAST(hour(timezone('America/New_York', timezone('UTC', ts))) AS BIGINT)
             AS hour_ny
    FROM events WHERE event_id < 500
    ORDER BY event_id
    """,
    doc=(
        "Session-TZ-independent timezone conversion (incl. a DST boundary: "
        "America/New_York is UTC-4/UTC-5 across the event range). Spark's "
        "convert_timezone on TIMESTAMP_NTZ mirrors DuckDB's "
        "timezone(tz, timezone('UTC', ts)) double-hop; neither side touches "
        "the session time zone, so results are reproducible on any cluster."
    ),
)
def q19_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 500)
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), F.col("ts"))
    tokyo = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), F.col("ts"))
    return ev.select(
        "event_id",
        ny.alias("ts_ny"),
        tokyo.alias("ts_tokyo"),
        F.hour(ny).cast("bigint").alias("hour_ny"),
    ).transform(present_sorted, "event_id")


@register(
    "q44_bool_bitwise_agg",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(bit_and(o_orderkey % 4096) AS BIGINT) AS keys_bit_and,
           CAST(bit_or(o_custkey % 4096) AS BIGINT) AS cust_bit_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS keys_bit_xor
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Boolean and bitwise aggregates (bool_and/bool_or, "
        "bit_and/bit_or/bit_xor) — order-insensitive by construction, so "
        "they need none of the float determinism machinery. Single hash "
        "aggregate with map-side partials."
    ),
)
def q44_bool_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.bit_and(F.col("o_orderkey") % 4096).cast("bigint").alias("keys_bit_and"),
            F.bit_or(F.col("o_custkey") % 4096).cast("bigint").alias("cust_bit_or"),
            F.bit_xor(F.col("o_orderkey")).cast("bigint").alias("keys_bit_xor"),
        )
        .transform(present_sorted, "o_orderpriority")
    )


@register(
    "q45_generator_calendar",
    oracle="""
    WITH cal AS (
      SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS d
    )
    SELECT cal.d, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.d
    GROUP BY cal.d ORDER BY cal.d
    """,
    doc=(
        "Generator table (range/generate_series as a relation): a synthesized "
        "calendar dimension left-joined to facts so zero-order days appear. "
        "The generated side is rows-from-nothing (no scan) and broadcasts; "
        "the classic gap-free reporting shape."
    ),
)
def q45_generator_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cal = spark.sql(
        "SELECT explode(sequence(DATE'1996-01-01', DATE'1996-03-31')) AS d"
    )
    # planner-built: the generated calendar is the tiny preserved side;
    # raw orders is fact-scale, so the dim pins to the co-partitioned
    # strategy (never a static broadcast)
    from highs_duckdb_spark.plans.cbo import JoinGraph

    g = JoinGraph(spark, sf_dir)
    g.fact("cal", cal, table="region")  # rows-from-nothing: any tiny stat
    g.dim(
        "orders",
        orders,
        F.col("o_orderdate").cast("date") == F.col("d"),
        after=("cal",),
        how="left",
        fact_scale=True,
    )
    return (
        g.plan()
        .groupBy("d")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .transform(present_sorted, "d")
    )


@register(
    "q46_string_agg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc=(
        "Ordered string aggregation: Spark 4 LISTAGG ... WITHIN GROUP "
        "(ORDER BY) paired with DuckDB string_agg(... ORDER BY). The "
        "explicit in-group ordering is what makes the result deterministic "
        "across engines and partitionings — never concatenate in arrival "
        "order on a distributed engine."
    ),
)
def q46_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "nation", sf_dir).createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


@register(
    "dq02_completeness_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders
        """
        for c in _PROFILE_COLS
    )
    + " ORDER BY column_name",
    category="data-quality",
    doc=(
        "Column-completeness profile (null count + exact distinct per "
        "column) — the schema-audit step before a training-data ingest. "
        "Spark computes all columns in ONE pass (multi-count-distinct "
        "expands then aggregates) and melts the single row with stack(); "
        "the oracle's UNION ALL of per-column scans is the naive form."
    ),
)
def dq02_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.isnull(c).cast("bigint")).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, null_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return (
        one.selectExpr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_null, n_distinct)"
        )
        .select(
            "column_name",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_null").cast("bigint").alias("n_null"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
        )
        .transform(present_sorted, "column_name")
    )


@register(
    "q47_asof_forward_tolerance",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, p.ts AS pts,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts, p.event_id) AS rk
      FROM c JOIN p ON p.user_id = c.user_id
                   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    )
    SELECT c.user_id, c.event_id AS click_id,
           CAST(coalesce(m.purchase_id, -1) AS BIGINT) AS next_purchase_id,
           CAST(coalesce(CAST(floor(epoch(m.pts)) AS BIGINT)
                         - CAST(floor(epoch(c.ts)) AS BIGINT), -1) AS BIGINT)
             AS secs_to_purchase
    FROM c LEFT JOIN m ON m.click_id = c.event_id AND m.rk = 1
    ORDER BY c.user_id, click_id
    """,
    doc=(
        "FORWARD as-of join with tolerance: each click matched to its next "
        "purchase within 2 hours (strictly after). Same union-and-carry "
        "single-shuffle pattern as q80 run time-descending — the oracle's "
        "pairwise inequality join is O(clicks x purchases) per user, the "
        "carry is one window pass. Reference: DuckDB ASOF JOIN "
        "(direction/tolerance variants)."
    ),
)
def q47_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit("c").alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit("p").alias("side")
    )
    tagged = clicks.unionByName(purchases)
    # Time-DESCENDING scan: "carry last non-null" = earliest future purchase.
    # Within equal ts, clicks sort first ('c' < 'p') so an equal-ts purchase
    # is NOT visible (strict >); among equal-ts purchases, event_id DESC
    # makes the carried (= last-seen) one the smallest event_id — matching
    # the oracle's (p.ts, p.event_id) tie-break.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").asc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.last(
        F.when(
            F.col("side") == "p",
            F.struct(F.col("ts").alias("pts"), F.col("event_id").alias("pid")),
        ),
        ignorenulls=True,
    ).over(w)
    carried = tagged.withColumn("nxt", nxt)
    # floored-seconds gap for OUTPUT; tolerance compares exact timestamps
    # (a floored gap of 7200 can hide a true gap of 7200.4s)
    gap = F.unix_timestamp(F.col("nxt.pts")) - F.unix_timestamp(F.col("ts"))
    within = F.col("nxt").isNotNull() & (
        F.col("nxt.pts") <= F.col("ts") + F.expr("INTERVAL 2 HOURS")
    )
    return (
        carried.filter(F.col("side") == "c")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.when(within, F.col("nxt.pid")).otherwise(F.lit(-1)).cast("bigint").alias(
                "next_purchase_id"
            ),
            F.when(within, gap).otherwise(F.lit(-1)).cast("bigint").alias(
                "secs_to_purchase"
            ),
        )
        .transform(present_sorted, "user_id", "click_id")
    )


@register(
    "q48_arg_max",
    oracle="""
    SELECT o_orderpriority,
           CAST(arg_max(o_orderkey,
                        CAST(round(o_totalprice * 100) AS BIGINT) * 100000000
                        + o_orderkey) AS BIGINT) AS biggest_order,
           round(1e-9 + max(o_totalprice), 2) AS biggest_total,
           CAST(arg_min(o_orderkey,
                        CAST(round(o_totalprice * 100) AS BIGINT) * 100000000
                        + o_orderkey) AS BIGINT) AS smallest_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "arg_max/arg_min (Spark max_by/min_by): the row-identifying "
        "aggregate. Ranked on an exact integer composite "
        "(cents x 1e8 + orderkey) so ties are impossible and both engines "
        "agree — arg_max on a raw double with duplicate values is "
        "nondeterministic on any parallel engine."
    ),
)
def q48_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    orders = load_table(spark, "orders", sf_dir)
    key = cents("o_totalprice") * F.lit(100000000) + F.col("o_orderkey")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", key).cast("bigint").alias("biggest_order"),
            F.round(F.lit(1e-9) + F.max("o_totalprice"), 2).alias("biggest_total"),
            F.min_by("o_orderkey", key).cast("bigint").alias("smallest_order"),
        )
        .transform(present_sorted, "o_orderpriority")
    )


# One SQL text serves both engines (like q17): GROUP BY ALL infers the
# grouping keys from the non-aggregate select items.
_Q49_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS total
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
"""


@register(
    "q49_group_by_all",
    oracle=_Q49_SQL,
    doc="GROUP BY ALL (keys inferred from the projection) — same SQL text on both engines.",
)
def q49_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_Q49_SQL)


@register(
    "q25_regexp_replace_groups",
    oracle=r"""
    SELECT p_partkey,
           regexp_replace(p_name, '(\w+) (\w+)', '\2-\1') AS flipped,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word
    FROM part WHERE p_partkey < 400
    ORDER BY p_partkey
    """,
    doc=(
        "Regex replacement with capture-group references. The PATTERN "
        "dialect is shared (both engines take this RE2-compatible syntax) "
        "but the REPLACEMENT syntax differs: Java/Spark writes $1, "
        "RE2/DuckDB writes \\1 — the operator pair encodes that mapping."
    ),
)
def q25_regexp_replace_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return (
        part.filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.regexp_replace("p_name", r"(\w+) (\w+)", r"$2-$1").alias("flipped"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        )
        .transform(present_sorted, "p_partkey")
    )


@register(
    "q27_ratio_to_report",
    oracle="""
    SELECT o_orderpriority,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / CAST(sum(sum(CAST(o_totalprice AS DECIMAL(12,2)))) OVER ()
                        AS DOUBLE), 6) AS revenue_share
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Ratio-to-report: each group's share of the global total via a "
        "window over the aggregate (sum of sums OVER ()). Numerator and "
        "denominator are exact integer-cent sums cast to double, so the "
        "IEEE division is identical on both engines. At scale this is a "
        "grouped aggregate plus a 1-row broadcast, never a second scan."
    ),
)
def q27_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from highs_duckdb_spark.functions.money import cents, from_cents

    orders = load_table(spark, "orders", sf_dir)
    g = orders.groupBy("o_orderpriority").agg(
        F.sum(cents("o_totalprice")).alias("c")
    )
    total = F.sum("c").over(Window.partitionBy())
    return (
        g.select(
            "o_orderpriority",
            F.round(
                F.lit(1e-9) + from_cents(F.col("c"), 2) / from_cents(total, 2), 6
            ).alias("revenue_share"),
        )
        .transform(present_sorted, "o_orderpriority")
    )


_FK_EDGES = (
    # (label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


@register(
    "dq03_referential_integrity",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{label}' AS relation,
               CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM {child} c
                     LEFT JOIN {parent} p ON c.{ck} = p.{pk}
                     WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphans
        """
        for label, child, ck, parent, pk in _FK_EDGES
    )
    + " ORDER BY relation",
    category="data-quality",
    doc=(
        "Referential-integrity audit: one row per FK edge with row and "
        "orphan counts (left-anti probe). The ingest gate that runs before "
        "any star-schema join lands in a training pipeline; at scale each "
        "probe is an anti join against a broadcast dim or a co-partitioned "
        "shuffle on the key — never a NOT IN (which also has the "
        "three-valued NULL trap)."
    ),
)
def dq03_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    def edge_report(label: str, child: str, ck: str, parent: str, pk: str) -> DataFrame:
        c = load_table(spark, child, sf_dir).select(ck)
        p = load_table(spark, parent, sf_dir).select(pk)
        # fact-scale parents (orders/lineitem key sets grow with SF) must
        # co-partition the anti probe; genuinely bounded dims may broadcast
        if parent in ("orders", "lineitem", "events"):
            p = p.hint(fact_join_strategy(sf_dir))
        orphans = c.join(p, F.col(ck) == F.col(pk), "left_anti")
        return (
            c.agg(F.count("*").alias("n_rows"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(label).alias("relation"),
                F.col("n_rows").cast("bigint"),
                F.col("n_orphans").cast("bigint"),
            )
        )

    reports = [edge_report(*e) for e in _FK_EDGES]
    return functools.reduce(lambda a, b: a.unionByName(b), reports).transform(
        present_sorted, "relation"
    )


@register(
    "dq04_volume_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY day
    ),
    s AS (
      SELECT day, n,
             count(*) OVER ()   AS k,
             sum(n) OVER ()     AS sn,
             sum(n * n) OVER () AS snn
      FROM d
    )
    SELECT day, CAST(n AS BIGINT) AS n_events,
           round(1e-9 + (n - (CAST(sn AS DOUBLE) / k))
                 / sqrt((CAST(snn AS DOUBLE) - (CAST(sn AS DOUBLE) / k) * sn)
                        / (k - 1)), 4) AS z,
           CAST(abs((n - (CAST(sn AS DOUBLE) / k))
                / sqrt((CAST(snn AS DOUBLE) - (CAST(sn AS DOUBLE) / k) * sn)
                       / (k - 1))) > 2.0 AS BOOLEAN) AS is_drift
    FROM s ORDER BY day
    """,
    doc=(
        "Ingest-volume drift control chart: per-day event counts z-scored "
        "against the corpus mean/stddev from exact integer moments (k, Σn, "
        "Σn² — identical IEEE arithmetic on both engines). The moments are "
        "a window over the ALREADY-AGGREGATED per-day rows: one fact "
        "shuffle on day, then a ~hundreds-row window — the pattern that "
        "flags a broken upstream feed in a 100 TB daily ingest."
    ),
)
def dq04_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    k = F.count("*").over(w)
    sn = F.sum("n").over(w)
    snn = F.sum(F.col("n") * F.col("n")).over(w)
    mean = sn.cast("double") / k
    sd = F.sqrt((snn.cast("double") - mean * sn) / (k - F.lit(1)))
    z = (F.col("n") - mean) / sd
    return (
        d.select(
            "day",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.lit(1e-9) + z, 4).alias("z"),
            (F.abs(z) > 2.0).alias("is_drift"),
        )
        .transform(present_sorted, "day")
    )


@register(
    "q26_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id
    )
    SELECT stage, users, round(1e-9 + CAST(users AS DOUBLE)
             / greatest(lag(users) OVER (ORDER BY ord), 1), 4) AS conv_from_prev
    FROM (
      SELECT 1 AS ord, 'view' AS stage, (SELECT count(*) FROM v) AS users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
    ) ORDER BY ord
    """,
    doc=(
        "Ordered event funnel (view -> click -> purchase): each stage keeps "
        "users whose first stage-event strictly follows their previous "
        "stage's first event — the sequential-pattern shape windowing alone "
        "cannot express. Every stage aggregates and joins on user_id, so "
        "after the first shuffle all stages are co-partitioned; stage "
        "tables shrink monotonically."
    ),
)
def q26_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    # Single-scan funnel: the three stage thresholds are CHAINED windows
    # over the same user partition — t1 feeds t2 feeds t3 without a new
    # exchange (same partitioning key), so the whole funnel is one events
    # scan + one user_id shuffle. The earlier per-stage join formulation
    # re-derived each stage per reference: 6 events scans in the plan.
    wu = Window.partitionBy("user_id")
    staged = (
        ev.withColumn("t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu))
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    totals = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    stages = totals.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("ord"), F.lit("view").alias("stage"), F.col("n1").alias("users")),
                F.struct(F.lit(2).alias("ord"), F.lit("click").alias("stage"), F.col("n2").alias("users")),
                F.struct(F.lit(3).alias("ord"), F.lit("purchase").alias("stage"), F.col("n3").alias("users")),
            )
        ).alias("s")
    ).select("s.ord", "s.stage", "s.users")
    w = Window.orderBy("ord")
    return stages.select(
        "stage",
        "users",
        F.round(
            F.lit(1e-9)
            + F.col("users").cast("double") / F.greatest(F.lag("users").over(w), F.lit(1)),
            4,
        ).alias("conv_from_prev"),
    )


@register(
    "q28_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
    )
    SELECT cohort_week,
           CAST((epoch(activity_week) - epoch(cohort_week)) / 604800 AS BIGINT) AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_week, weeks_since
    ORDER BY cohort_week, weeks_since
    """,
    doc=(
        "Weekly cohort retention grid: users bucketed by first-seen week, "
        "counted in every subsequent week they were active. One shuffle on "
        "user_id covers the first-seen aggregate, the per-(user, week) "
        "dedup, and the join (co-partitioned); the final (cohort, offset) "
        "rollup aggregates the already-small grid."
    ),
)
def q28_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("activity_week")
    ).distinct()
    weeks_since = (
        (F.unix_timestamp(F.col("activity_week").cast("timestamp")) - F.unix_timestamp(F.col("cohort_week").cast("timestamp"))) / 604800
    ).cast("bigint")
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_week", weeks_since.alias("weeks_since"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .transform(present_sorted, "cohort_week", "weeks_since")
    )


@register(
    "q29_window_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(1e-9 + percent_rank() OVER w, 6) AS pr,
           round(1e-9 + CAST(o_totalprice AS DECIMAL(12,2))
                 / nth_value(CAST(o_totalprice AS DECIMAL(12,2)), 1)
                   OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
             AS vs_top,
           CAST(dense_rank() OVER w AS BIGINT) AS drk
    FROM orders
    WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, drk, o_orderkey
    """,
    doc=(
        "Rank-family completion: percent_rank, nth_value over a full-frame "
        "window, dense_rank — the remaining ANSI window functions not "
        "already exercised by q30-q34/q86. One shuffle on the partition "
        "key; ties broken by o_orderkey so both engines order identically."
    ),
)
def q29_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 500)
    price = F.col("o_totalprice").cast("decimal(12,2)")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.lit(1e-9) + F.percent_rank().over(w), 6).alias("pr"),
            F.round(
                F.lit(1e-9) + (price / F.nth_value(price, 1).over(wf)).cast("double"), 6
            ).alias("vs_top"),
            F.dense_rank().over(w).cast("bigint").alias("drk"),
        )
        .transform(ordered_wide, "o_orderpriority", "drk", "o_orderkey")
    )


@register(
    "q39_filtered_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(count(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT) AS n_discounted,
           round(1e-9 + CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 FILTER (WHERE l_discount >= 0.05) AS DOUBLE) / 100.0, 2) AS discounted_revenue
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc=(
        "ANSI FILTER-clause aggregates (the declarative form of conditional "
        "aggregation; q63 exercises the CASE form): per-flag counts and an "
        "exact-cents revenue restricted by independent predicates, one "
        "grouped pass. Run through spark.sql so the SQL surface itself is "
        "exercised, not a DataFrame translation."
    ),
)
def q39_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("q39_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
               CAST(count(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT) AS n_discounted,
               round(1e-9 + CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     FILTER (WHERE l_discount >= 0.05) AS DOUBLE) / 100.0, 2)
                 AS discounted_revenue
        FROM q39_lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "q98_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, flag, status
    """,
    doc=(
        "GROUPING()/grouping-id disambiguation over grouping sets: "
        "distinguishes a real NULL group key from a rollup-generated "
        "subtotal row — the standard way BI layers consume multi-level "
        "aggregates. Single expand+aggregate pass (one shuffle)."
    ),
)
def q98_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("bigint")
    return (
        li.groupingSets(
            [
                [F.col("l_returnflag"), F.col("l_linestatus")],
                [F.col("l_returnflag")],
                [],
            ],
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(gid.alias("gid"), F.count("*").cast("bigint").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
        )
        .orderBy("gid", "flag", "status")
    )


@register(
    "q99_window_exclude_current",
    oracle="""
    SELECT event_id, user_id,
           round(1e-9 + CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                         EXCLUDE CURRENT ROW) AS DOUBLE)
                 / (100.0 * greatest(count(*)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                         EXCLUDE CURRENT ROW), 1)), 6) AS peer_avg
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
    doc=(
        "EXCLUDE CURRENT ROW window frames — a reference-engine (DuckDB) "
        "feature Spark's frame syntax lacks. Rewritten exactly as "
        "(frame_sum - current) / (frame_count - 1) over the plain frame: "
        "the oracle runs DuckDB's NATIVE EXCLUDE clause, so the hash match "
        "proves the rewrite is semantics-preserving, not approximately so. "
        "Sums are integer cents, division order is identical on both "
        "engines. Same one-shuffle window plan as any ROWS frame."
    ),
)
def q99_window_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from highs_duckdb_spark.functions.money import cents

    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    peer_sum = F.sum(cents("value")).over(w) - cents("value")
    peer_cnt = F.count("*").over(w) - F.lit(1)
    # empty excluded frame (single-row partition): DuckDB's native EXCLUDE
    # clause sums an EMPTY frame -> NULL; the rewrite must yield NULL too,
    # not 0/1 = 0.0 (the greatest() below only guards the division).
    peer_avg = F.when(
        peer_cnt == 0, F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.lit(1e-9)
            + peer_sum.cast("double") / (100.0 * F.greatest(peer_cnt, F.lit(1))),
            6,
        )
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            peer_avg.alias("peer_avg"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q09_scalar_subquery_projection",
    oracle="""
    SELECT o_orderkey,
           round(1e-9 + CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                 / CAST((SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                         FROM orders) AS DOUBLE), 9) AS share_of_book,
           CAST(o_orderkey IN (SELECT DISTINCT o_orderkey FROM orders
                               WHERE o_orderpriority = '1-URGENT') AS BOOLEAN) AS is_urgent
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc=(
        "Uncorrelated scalar subquery in the projection (each order's share "
        "of total book value) plus an IN-subquery projected as a boolean — "
        "Catalyst plans the scalar as a one-row broadcast (Subquery "
        "scalar-subquery in the plan) and the IN as a left-semi-derived "
        "flag, both single-execution, never per-row re-evaluation. Run via "
        "spark.sql so the SQL subquery surface itself is exercised."
    ),
)
def q09_scalar_subquery_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("q09_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(1e-9 + CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     / CAST((SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                             FROM q09_orders) AS DOUBLE), 9) AS share_of_book,
               CAST(o_orderkey IN (SELECT DISTINCT o_orderkey FROM q09_orders
                                   WHERE o_orderpriority = '1-URGENT') AS BOOLEAN)
                 AS is_urgent
        FROM q09_orders
        WHERE o_orderkey < 200
        ORDER BY o_orderkey
        """
    )


# One SQL text serves both engines (like q17): Spark 4 ships WITH RECURSIVE
# (SPARK-24497), so the reference engine's recursive-CTE surface now has a
# NATIVE Spark form — d07/g03 keep the driver-loop formulation for graphs
# whose frontier must be checkpointed, this exercises the built-in.
_Q69_SQL = """
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 3 + 1) % 25 AS dst FROM nation
      UNION ALL
      SELECT n_nationkey, (n_nationkey * 7 + 2) % 25 FROM nation
    ),
    reach(nk, hop) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT CAST(e.dst AS BIGINT), hop + 1
      FROM reach JOIN edges e ON e.src = reach.nk
      WHERE hop < 4
    )
    SELECT n_name, CAST(min(hop) AS BIGINT) AS hops
    FROM reach JOIN nation ON nk = n_nationkey
    GROUP BY n_name
    ORDER BY hops, n_name
"""


@register(
    "q69_recursive_cte",
    oracle=_Q69_SQL,
    doc=(
        "Native WITH RECURSIVE (Spark 4 / SPARK-24497): min-hop BFS over a "
        "deterministic 2-out-regular graph on the nation table, identical "
        "SQL text on both engines. Branching 2 x depth 4 bounds the "
        "working set; each recursive step is one join against the "
        "(broadcastable) edge list — the engine materializes the frontier "
        "per step exactly like g03's driver loop, but planned natively."
    ),
)
def q69_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "nation", sf_dir).createOrReplaceTempView("nation")
    return spark.sql(_Q69_SQL)


@register(
    "dq05_financial_reconciliation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS li_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_cents,
             coalesce(li_cents, 0) AS li_cents
      FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(o_cents - li_cents) > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatched,
           round(1e-9 + CAST(max(abs(o_cents - li_cents)) AS DOUBLE) / 100.0, 2)
             AS max_abs_diff,
           round(1e-9 + CAST(sum(abs(o_cents - li_cents)) AS DOUBLE) / 100.0, 2)
             AS total_abs_diff
    FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=(
        "Cross-table financial reconciliation: does each order's stored "
        "total match the sum of its line items? Exact integer-cents "
        "arithmetic end-to-end (a reconciliation that itself rounds is "
        "worthless); lineitem aggregates once on l_orderkey and joins "
        "orders co-partitioned on the same key (strategy hint — both sides "
        "fact-scale), then rolls up to priority level. The synthetic data "
        "does NOT balance — the audit's job is to quantify exactly that."
    ),
)
def dq05_financial_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.functions.money import cents

    li = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sum(cents("l_extendedprice")).alias("li_cents"))
    )
    orders = load_table(spark, "orders", sf_dir)
    diff = F.abs(F.col("o_cents") - F.col("li_cents"))
    # planner-built: the per-order lineitem rollup is orders-grained but
    # grows with SF — fact_scale keeps the reconciliation co-partitioned;
    # under the orderkey-bucketed layout both sides join exchange-free
    from highs_duckdb_spark.plans.cbo import JoinGraph

    g = JoinGraph(spark, sf_dir)
    g.fact(
        "orders_sel",
        orders.select(
            "o_orderkey", "o_orderpriority", cents("o_totalprice").alias("o_cents")
        ),
        table="orders",
    )
    g.dim(
        "li_rollup",
        li,
        F.col("o_orderkey") == F.col("l_orderkey"),
        after=("orders_sel",),
        table="orders",
        how="left",
        fact_scale=True,
    )
    return (
        g.plan()
        .select(
            "o_orderpriority",
            "o_cents",
            F.coalesce("li_cents", F.lit(0)).alias("li_cents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(diff > 1, 1).otherwise(0)).cast("bigint").alias("n_mismatched"),
            F.round(F.lit(1e-9) + F.max(diff).cast("double") / 100.0, 2).alias("max_abs_diff"),
            F.round(F.lit(1e-9) + F.sum(diff).cast("double") / 100.0, 2).alias("total_abs_diff"),
        )
        .transform(present_sorted, "o_orderpriority")
    )
