"""TPC-H shapes round 2: Q4/Q7/Q8/Q9/Q10/Q12/Q13/Q14/Q15/Q17/Q19/Q21
analogues adapted to the synthetic schema (no partsupp / commitdate /
shipmode columns, so each query keeps the *shape* — the join graph,
subquery pattern, and aggregation structure — over the columns that
exist).

These are the remaining decision-support patterns a user of the reference
engine would port: EXISTS/NOT-EXISTS decorrelation, disjunctive predicate
pushdown, conditional-aggregate ratios, two-level aggregation histograms,
scalar-max subqueries, and correlated-average filters.

Scale notes: the multi-join shapes declare fact/dim graphs to the CBO-lite
planner (plans/cbo.py) — join order, co-partitioned strategy hints,
broadcast-vs-demotion, alternate-copy and materialized-projection
substitution are all planner decisions from catalog stats; raw fact-class
probe sides declare ``fact_scale=True`` so they can never become a static
broadcast. Correlated subqueries are decorrelated into single-pass
window/groupBy plans rather than per-row re-scans, so each query is one
or two shuffles of the fact table at most.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.plans.cbo import JoinGraph, cluster_by
from highs_duckdb_spark.session import load_table
from highs_duckdb_spark.sources.layout import (
    eq_selectivity,
    pruned_scan_dates,
    range_selectivity,
)

# exact-decimal revenue term shared by most TPC-H shapes (see module doc in
# relational.py: money sums are DECIMAL-exact so both engines agree bitwise)


def _disc_price():
    # canonical builder shared with the agg-MV specs (functions/money.py:
    # matching compares expression text, so both sides must build it
    # through the same helper)
    from highs_duckdb_spark.functions.money import disc_price

    return disc_price()


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q100_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: order counts per priority where EXISTS a late "
        "lineitem — correlated EXISTS decorrelated to a left-semi join."
    ),
)
def q100_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = pruned_scan_dates(
        spark, sf_dir, "orders", "o_orderdate", lo="1996-01-01", hi="1997-01-01"
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # planner-built semi join: the raw lineitem projection is fact-scale at
    # 100 TB, so the dim demotes from broadcast to the co-partitioned
    # strategy past the catalog-byte cap (a static broadcast is never
    # revisited by AQE, so the encoding must forbid it at scale). The
    # non-equi lateness predicate rides the join condition.
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    g = JoinGraph(spark, sf_dir)
    g.fact(
        "orders",
        orders,
        sel=range_selectivity(sf_dir, "orders", "o_orderdate",
                              lo="1996-01-01", hi="1997-01-01", default=0.17),
    )
    g.dim(
        "lineitem",
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        after=("orders",),
        how="left_semi",
        fact_scale=True,  # raw lineitem probe: never a static broadcast
    )
    return (
        g.plan()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q101_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           round(1e-9 + CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_DISC_PRICE_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape: bilateral trade volume by year — the nation "
        "dimension joined twice under different roles, disjunctive "
        "nation-pair filter, year extraction grouping."
    ),
)
def q101_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # CBO-lite plans the three-fact tree (order, strategy hints, layout
    # bucketing, projection matching) from catalog stats; supplier demotes
    # from broadcast to co-partitioned past the scale cap, nations are
    # bounded. columns= lets the planner substitute the lineitem_orders
    # projection under an attached layout — all needed lineitem/orders
    # columns are inside it.
    #
    # Round 8: the whole query is declared — structural dims, the ship-
    # year DERIVED group key, and the volume aggregate — so under an
    # attached layout the planner serves it from the rev_by_nation_year
    # AGGREGATE MV (ship_year grain column, vol_dec partial): the 6-way
    # join collapses to a ~9k-row MV scan + two broadcast nation joins +
    # the (supp, cust, year) combine. The nation-pair filter runs ABOVE
    # the aggregate (it references only group keys, so filtering groups
    # equals filtering rows) — identical results on every path.
    g = JoinGraph(spark, sf_dir)
    g.fact(
        "lineitem",
        li,
        columns=("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"),
    )
    g.fact("orders", orders, columns=("o_custkey",))
    g.fact("customer", cust, columns=("c_custkey", "c_nationkey"))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.dim(
        "supplier", sup, on=("l_suppkey", "s_suppkey"), after=("lineitem",),
        unique_key=True, catalog_rows=True,
    )
    g.dim(
        "n1", n1, on=("s_nationkey", "n1_key"), after=("supplier",),
        table="nation", unique_key=True,
    )
    g.dim(
        "n2", n2, on=("c_nationkey", "n2_key"), after=("customer",),
        table="nation", unique_key=True,
    )
    g.aggregate(
        ("supp_nation", "cust_nation", ("l_year", ("year", "l_shipdate"))),
        {
            "volume_sum": (
                "sum",
                _disc_price(),
                ("l_extendedprice", "l_discount"),
            )
        },
    )
    return (
        g.plan()
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.lit(1e-9) + F.col("volume_sum").cast("double"), 2).alias(
                "revenue"
            ),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q102_market_share",
    oracle=f"""
    SELECT l_year,
           round(1e-9 + CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                                      ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS l_year,
             n1.n_name AS supp_nation,
             CAST({_DISC_PRICE_SQL} AS DECIMAL(14,4)) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) all_volume
    GROUP BY l_year
    ORDER BY l_year
    """,
    doc=(
        "TPC-H Q8 shape: one nation's market share inside a region per year "
        "— conditional-aggregate ratio over a 6-way join, exact-decimal "
        "numerator/denominator so both engines agree bitwise."
    ),
)
def q102_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    # planner-built fact tree; region chains off n2, supplier off lineitem
    # — all broadcast below the scale cap, demoted above it. The
    # lineitem_orders projection matches when attached (o_orderdate,
    # o_custkey, l_suppkey, prices all inside it).
    #
    # Round 8: the per-(year, supp_nation) volume rollup is DECLARED to
    # the planner; the market-share ratio regroups those partials by year
    # above it. Decimal sums are associative, so the two-level sum is
    # bit-identical to the one-level oracle sum. Under an attached layout
    # the declared rollup rides the rev_by_nation_year AGGREGATE MV
    # (o_year grain, vol_dec14 partial) — the 7-way join never runs.
    g = JoinGraph(spark, sf_dir)
    g.fact(
        "lineitem",
        li,
        columns=("l_suppkey", "l_extendedprice", "l_discount"),
    )
    g.fact("orders", orders, columns=("o_custkey", "o_orderdate"))
    g.fact("customer", cust, columns=("c_custkey", "c_nationkey"))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.dim(
        "supplier", sup, on=("l_suppkey", "s_suppkey"), after=("lineitem",),
        unique_key=True, catalog_rows=True,
    )
    g.dim(
        "n1", n1, on=("s_nationkey", "n1_key"), after=("supplier",),
        table="nation", unique_key=True,
    )
    g.dim(
        "n2", n2, on=("c_nationkey", "n2_key"), after=("customer",),
        table="nation", unique_key=True,
    )
    # sel DERIVED: 1-of-NDV(r_name) from the footer sidecar
    g.dim(
        "region",
        region,
        on=("n2_region", "r_regionkey"),
        after=("n2",),
        sel=eq_selectivity(sf_dir, "region", "r_name", default=0.2),
        unique_key=True,
    )
    g.aggregate(
        (("l_year", ("year", "o_orderdate")), "supp_nation"),
        {
            "vol": (
                "sum",
                _disc_price().cast("decimal(14,4)"),
                ("l_extendedprice", "l_discount"),
            )
        },
    )
    rollup = g.plan()  # (l_year, supp_nation, vol: dec(24,4))
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        rollup.groupBy("l_year")
        .agg(
            F.round(
                F.lit(1e-9)
                + F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("vol")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("vol").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("l_year")
    )


@register(
    "q103_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           round(1e-9 + CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL}
             - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(4,2))
               * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc=(
        "TPC-H Q9 shape: per-nation yearly profit (revenue minus a 10%%-of-"
        "retail cost proxy — the synthetic schema has no partsupp) over a "
        "5-way join filtered by part type."
    ),
)
def q103_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    amount = _disc_price() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.10).cast("decimal(4,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    # planner-built: part (filtered, sel≈1-of-5 types) and supplier attach
    # off lineitem at the earliest legal point — broadcast below the cap,
    # co-partitioned above it; nation chains off supplier. l_partkey /
    # l_quantity joined the lineitem_orders projection in round 7 (the
    # advisor's widening — this query's recorded missing_columns decline),
    # so the pair substitutes under the layout with zero query changes.
    g = JoinGraph(spark, sf_dir)
    g.fact(
        "lineitem",
        li,
        columns=(
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ),
    )
    g.fact("orders", orders, columns=("o_orderdate",))
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    # sel DERIVED: 1-of-NDV(p_type) from the footer sidecar
    g.dim(
        "part",
        part,
        F.col("p_partkey") == F.col("l_partkey"),
        after=("lineitem",),
        sel=eq_selectivity(sf_dir, "part", "p_type", default=0.2),
    )
    g.dim("supplier", sup, F.col("s_suppkey") == F.col("l_suppkey"), after=("lineitem",))
    g.dim("nation", nation, F.col("s_nationkey") == F.col("n_nationkey"), after=("supplier",))
    return (
        g.plan()
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.lit(1e-9) + F.sum(amount).cast("double"), 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q104_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           round(1e-9 + CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: top-20 customers by returned-item revenue in a "
        "half-year window — 4-way join, broadcast dims, decimal-exact "
        "revenue so DESC ordering ties break identically, custkey tiebreak."
    ),
)
def q104_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)

    def in_half_year(df: DataFrame) -> DataFrame:
        return df.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )

    def returned(df: DataFrame) -> DataFrame:
        return df.filter(F.col("l_returnflag") == "R")

    orders = pruned_scan_dates(
        spark, sf_dir, "orders", "o_orderdate", lo="1997-01-01", hi="1997-07-01"
    )
    li = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    # planner-built; prepare= opts orders into the layout's alternate
    # clustered copies. l_returnflag is outside the lineitem_orders
    # projection, so the matcher declines (the column-subsumption guard).
    g = JoinGraph(spark, sf_dir)
    g.fact("customer", cust)
    g.fact(
        "orders",
        orders,
        sel=range_selectivity(sf_dir, "orders", "o_orderdate",
                              lo="1997-01-01", hi="1997-07-01", default=0.08),
        prepare=in_half_year,
        columns=("o_custkey", "o_orderdate"),
    )
    g.fact(
        "lineitem",
        li,
        # sel DERIVED: 1-of-NDV(l_returnflag) from the footer sidecar
        sel=eq_selectivity(sf_dir, "lineitem", "l_returnflag", default=0.33),
        prepare=returned,
        columns=("l_returnflag", "l_extendedprice", "l_discount"),
    )
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.dim("nation", nation, F.col("c_nationkey") == F.col("n_nationkey"), after=("customer",))
    return (
        g.plan()
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.lit(1e-9) + F.sum(_disc_price()).cast("double"), 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q105_shipping_delay_buckets",
    oracle="""
    SELECT delay_bucket,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                  ELSE 'slow' END AS delay_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    ) t
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
    doc=(
        "TPC-H Q12 shape: priority counts per shipping-delay bucket (the "
        "synthetic schema has no shipmode, so the bucket is the "
        "orderdate→shipdate delay) — conditional-sum pivot over a fact join."
    ),
)
def q105_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = pruned_scan_dates(
        spark, sf_dir, "lineitem", "l_shipdate", lo="1997-01-01", hi="1998-01-01"
    )

    def shipped_1997(df: DataFrame) -> DataFrame:
        return df.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )

    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # planner-built; every needed column (l_shipdate, o_orderdate,
    # o_orderpriority) is inside the lineitem_orders projection, so under
    # an attached layout this whole join collapses into a single
    # projection scan — zero joins, zero fact exchanges.
    g = JoinGraph(spark, sf_dir)
    g.fact("orders", orders, columns=("o_orderdate", "o_orderpriority"))
    g.fact(
        "lineitem",
        li,
        sel=range_selectivity(sf_dir, "lineitem", "l_shipdate",
                              lo="1997-01-01", hi="1998-01-01", default=0.17),
        prepare=shipped_1997,
        columns=("l_shipdate",),
    )
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    return (
        g.plan()
        .select(
            bucket.alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "q106_customer_order_histogram",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 shape: customer-order-count histogram — left outer join "
        "with an ON-clause filter (kept pre-join so zero-order customers "
        "survive), then a second-level aggregation over the first."
    ),
)
def q106_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # planner-built left outer with the ON-clause filter kept in the join
    # condition (zero-order customers survive); orders is fact-scale so the
    # dim demotes past the byte cap instead of hard-coding the strategy
    g = JoinGraph(spark, sf_dir)
    g.fact("customer", cust)
    g.dim(
        "orders",
        orders,
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") != "P"),
        after=("customer",),
        how="left_outer",
        fact_scale=True,  # raw orders side: never a static broadcast
        prepare=lambda df: df.select("o_custkey", "o_orderkey", "o_orderstatus"),
        key="o_custkey",  # layout's custkey copy → exchange-free outer join
    )
    per_cust = (
        g.plan()
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q107_promo_revenue",
    oracle=f"""
    SELECT round(1e-9 + 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST({_DISC_PRICE_SQL} AS DECIMAL(14,4))
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(sum(CAST({_DISC_PRICE_SQL} AS DECIMAL(14,4))) AS DOUBLE),
                 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc=(
        "TPC-H Q14 shape: promo revenue percentage in a month — "
        "conditional-aggregate ratio, broadcast part join, exact-decimal "
        "numerator and denominator."
    ),
)
def q107_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = pruned_scan_dates(
        spark, sf_dir, "lineitem", "l_shipdate", lo="1997-03-01", hi="1997-04-01"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    vol = _disc_price().cast("decimal(14,4)")
    zero = F.lit(0).cast("decimal(14,4)")
    # planner-built: part is a dim off the filtered lineitem month —
    # broadcast below the scale cap, co-partitioned above it (part grows
    # with SF; a hard-coded broadcast would break a 1000x scale-up)
    g = JoinGraph(spark, sf_dir)
    # sel DERIVED: zone interpolation over the one-month shipdate window
    g.fact(
        "lineitem",
        li,
        sel=range_selectivity(sf_dir, "lineitem", "l_shipdate",
                              lo="1997-03-01", hi="1997-04-01", default=0.014),
    )
    g.dim("part", part, F.col("l_partkey") == F.col("p_partkey"), after=("lineitem",))
    return (
        g.plan()
        .agg(
            F.round(
                F.lit(1e-9)
                + F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q108_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST({_DISC_PRICE_SQL} AS DECIMAL(14,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(1e-9 + CAST(total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue — "
        "scalar-max subquery against a derived view; the equality compare "
        "runs on the exact DECIMAL revenue (never on a rounded double)."
    ),
)
def q108_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = pruned_scan_dates(
        spark, sf_dir, "lineitem", "l_shipdate", lo="1997-01-01", hi="1997-04-01"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup = load_table(spark, "supplier", sf_dir)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price().cast("decimal(14,4)")).alias("total_revenue_dec")
    )
    max_rev = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    # planner-built: the aggregated revenue view is supplier-grained (one
    # row per suppkey — supplier is its size stat), supplier attaches as a
    # dim; the scalar max stays an explicit broadcast (single row).
    g = JoinGraph(spark, sf_dir)
    g.fact("revenue", revenue, table="supplier")
    g.dim("supplier", sup, F.col("s_suppkey") == F.col("supplier_no"), after=("revenue",))
    return (
        g.plan()
        .join(F.broadcast(max_rev), F.col("total_revenue_dec") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.lit(1e-9) + F.col("total_revenue_dec").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q109_small_quantity_revenue",
    oracle="""
    SELECT round(1e-9 + CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                                      / count(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc=(
        "TPC-H Q17 shape: revenue from unusually-small-quantity orders — "
        "correlated per-part average decorrelated into a groupBy + join "
        "(one pass over the fact table, no per-row re-scan)."
    ),
)
def q109_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            )
        ).alias("half_avg_qty")
    )
    # planner-built: lineitem ⋈ per-part averages is fact ⋈ part-grained
    # aggregate (part is per_part's size stat; co-partitioned on l_partkey
    # past the cap); the filtered part list is a broadcast-candidate dim.
    g = JoinGraph(spark, sf_dir)
    g.fact("lineitem", li)
    g.fact("per_part", per_part, table="part")
    g.edge("lineitem", "l_partkey", "per_part", "ap_partkey")
    # sel DERIVED: 1-of-NDV(p_brand) from the footer sidecar
    g.dim(
        "part",
        part,
        F.col("p_partkey") == F.col("l_partkey"),
        after=("lineitem",),
        sel=eq_selectivity(sf_dir, "part", "p_brand", default=0.1),
    )
    return (
        g.plan()
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.lit(1e-9)
                + F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q110_disjunctive_filter",
    oracle=f"""
    SELECT round(1e-9 + CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc=(
        "TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity "
        "clauses — tests that an OR-of-ANDs predicate still prunes at the "
        "scan (partial pushdown of the common join key + per-branch "
        "filters)."
    ),
)
def q110_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    clause = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    # planner-built: part attaches as a dim (broadcast below the cap,
    # co-partitioned above); the OR-of-ANDs clause filters post-join, its
    # l_quantity branches pushed to the lineitem scan by Catalyst
    g = JoinGraph(spark, sf_dir)
    g.fact("lineitem", li)
    g.dim("part", part, F.col("p_partkey") == F.col("l_partkey"), after=("lineitem",))
    return (
        g.plan()
        .filter(clause)
        .agg(
            F.round(F.lit(1e-9) + F.sum(_disc_price()).cast("double"), 2).alias("revenue")
        )
    )


@register(
    "q111_last_to_ship_suppliers",
    oracle="""
    WITH marked AS (
      SELECT l_orderkey, l_suppkey,
             max(l_shipdate) OVER (PARTITION BY l_orderkey) AS order_last,
             max(l_shipdate) OVER (PARTITION BY l_orderkey, l_suppkey) AS supp_last,
             count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
      FROM lineitem
    ),
    blamed AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM marked
      WHERE n_supp > 1 AND supp_last = order_last
        AND 1 = (SELECT count(DISTINCT m2.l_suppkey) FROM marked m2
                 WHERE m2.l_orderkey = marked.l_orderkey
                   AND m2.supp_last = m2.order_last)
    )
    SELECT s_name, count(*) AS numwait
    FROM blamed JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc=(
        "TPC-H Q21 shape: suppliers who were the sole last-to-ship on "
        "multi-supplier orders (no commit/receipt dates in the synthetic "
        "schema, so lateness = strictly latest shipdate) — "
        "EXISTS/NOT-EXISTS decorrelated into per-order window aggregates."
    ),
)
def q111_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # ONE shuffle on l_orderkey: hash-partitioning on l_orderkey satisfies
    # the (l_orderkey, l_suppkey) groupBy's clustering requirement (subset
    # rule) AND the window partitioning below, so the fact table moves once
    # (plan-audited in test_plans.py). Under the orderkey-bucketed layout
    # cluster_by is a no-op — the scan's bucket partitioning already
    # satisfies both, and the query runs with ZERO fact shuffles.
    per_supp = (
        cluster_by(li, spark, sf_dir, "lineitem", "l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        F.max("supp_last").over(w).alias("order_last"),
        F.count("*").over(w).alias("n_supp"),
    ).withColumn(
        "n_at_last",
        F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)).over(w),
    )
    blamed = marked.filter(
        (F.col("n_supp") > 1)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_at_last") == 1)
    ).select("l_orderkey", "l_suppkey")
    sup = load_table(spark, "supplier", sf_dir)
    return (
        blamed.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q112_important_part_values",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             sum({_DISC_PRICE_SQL}) AS v,
             sum(sum({_DISC_PRICE_SQL})) OVER () AS t,
             count(*) OVER () AS n_parts
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(1e-9 + CAST(v AS DOUBLE), 2) AS part_value
    FROM per_part
    WHERE CAST(v AS DOUBLE) > 1.5 * (CAST(t AS DOUBLE) / n_parts)
    ORDER BY part_value DESC, l_partkey
    """,
    doc=(
        "TPC-H Q11 shape (important stock): per-part revenue exceeding a "
        "threshold derived from a global scalar subquery (here 1.5x the mean "
        "part value — the reference's fixed fraction is sf-dependent; the "
        "mean keeps the selectivity stable across scale factors). The "
        "global total is a window over the ALREADY-AGGREGATED per-part "
        "rows — one fact shuffle, never a second scan of lineitem. "
        "Reference parity target: TPC-H Q11's HAVING sum(...) > (SELECT "
        "sum(...)*f) pattern over the host engine's SQL surface."
    ),
)
def q112_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_extendedprice", "l_discount")
    per_part = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("v"))
    w = Window.partitionBy()
    # identical IEEE evaluation order on both engines: 1.5 * (t / n)
    thresh = F.lit(1.5) * (F.sum("v").over(w).cast("double") / F.count("*").over(w))
    return (
        per_part.withColumn("thresh", thresh)
        .filter(F.col("v").cast("double") > F.col("thresh"))
        .select(
            "l_partkey",
            F.round(F.lit(1e-9) + F.col("v").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "q113_dominant_part_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
             sum(sum(CAST(l_quantity AS DECIMAL(12,2))))
               OVER (PARTITION BY l_partkey) AS tq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS n_dominated_parts
    FROM per
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      AND CAST(sq AS DOUBLE) > 0.5 * CAST(tq AS DOUBLE)
    GROUP BY s_name
    ORDER BY s_name
    """,
    doc=(
        "TPC-H Q20 shape (potential part promotion): suppliers who shipped "
        "more than half of a promo part's 1996 volume — nested IN "
        "subqueries plus a correlated per-part scalar threshold, "
        "decorrelated into one (l_partkey, l_suppkey) grouped pass with a "
        "per-part window total (no partsupp/availqty in the synthetic "
        "schema, so shipped quantity stands in for stock). One fact "
        "shuffle on l_partkey (subset rule covers the pair groupBy and "
        "the part window); part filter and supplier lookup broadcast."
    ),
)
def q113_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        pruned_scan_dates(
            spark, sf_dir, "lineitem", "l_shipdate", lo="1996-01-01", hi="1997-01-01"
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    promo = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    per = (
        cluster_by(
            li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi"),
            spark,
            sf_dir,
            "lineitem",
            "l_partkey",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"))
        .withColumn("tq", F.sum("sq").over(Window.partitionBy("l_partkey")))
    )
    dominated = per.filter(F.col("sq").cast("double") > 0.5 * F.col("tq").cast("double"))
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        dominated.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("n_dominated_parts"))
        .orderBy("s_name")
    )
