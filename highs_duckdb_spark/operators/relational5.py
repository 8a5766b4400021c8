"""Round-2 relational additions: bloom-filter semi-join reduction and the
native session-window aggregate.

Both are oracle-checked: the bloom pre-filter is followed by the exact
join (false positives are eliminated), so its result equals the plain
join; the session-window aggregate is compared against DuckDB's classic
gaps-and-islands formulation of the same 30-minute sessionization.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.money import cents, money_sum
from highs_duckdb_spark.functions.presentation import ordered_wide, present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.operators.relational import (
    _HLL_SQL_EST,
    _HLL_SQL_HASH,
    _HLL_SQL_MR,
    _HLL_SQL_ZS_V,
    _hll_estimate,
    _hll_hash32,
    _hll_max_rank,
    _hll_zs_v,
)
from highs_duckdb_spark.session import load_table

# Bloom geometry: m must be a power of two so pmod(xxhash64, m) is uniform;
# 2^16 bits = 1 KiB of longs in the plan regardless of build cardinality —
# that fixed size is the whole point of the technique at 100 TB (an exact
# key set would grow with the data; the filter does not).
_BLOOM_BITS = 1 << 16
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (0x5EED0, 0x5EED1, 0x5EED2)


def _bloom_positions(col):
    """The k bit positions of ``col`` — computed with the JVM-side xxhash64
    so build and probe agree without any Python hashing."""
    return [F.pmod(F.xxhash64(col, F.lit(s)), F.lit(_BLOOM_BITS)) for s in _BLOOM_SEEDS]


@register(
    "q114_bloom_semijoin_reduction",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(1e-9 + CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=(
        "Bloom-filter semi-join reduction: the probe side (lineitem) is "
        "pre-filtered by a fixed-size bloom filter of the build side's keys "
        "BEFORE the join shuffle, then the exact join removes the false "
        "positives — the result equals the plain join (the oracle). At "
        "100 TB this is the runtime-filter pattern that cuts the fact "
        "shuffle to the selective subset; the filter itself stays 1 KiB "
        "whatever the build cardinality."
    ),
)
def q114_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, "lineitem", sf_dir)

    # Build: OR the per-key bits into 64-bit words JVM-side (bit_or with
    # map-side partial aggregation) — the collect is ≤ 1024 words however
    # many build rows there are; hashing happens JVM-side too (xxhash64),
    # so build and probe agree with zero Python in either path.
    word_rows = (
        orders.select(F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p"))
        .select(
            (F.col("p") / F.lit(64)).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in word_rows:
        words[int(r["w"])] = int(r["bits"])
    # one literal-array expression (a per-element F.lit comprehension costs
    # ~1k Py4J round trips — measured ~2s of pure plan construction)
    bits = F.lit(words).cast("array<bigint>")

    def might_contain(col):
        checks = [
            F.getbit(
                F.element_at(bits, (h / F.lit(64)).cast("int") + 1),
                h % F.lit(64),
            )
            == 1
            for h in _bloom_positions(col)
        ]
        return reduce(lambda a, b: a & b, checks)

    pre = li.filter(might_contain(F.col("l_orderkey")))
    # planner-built: the filtered orders side is still fact-scale (grows
    # with SF) — the exact join stays co-partitioned, never a static
    # fact broadcast
    from highs_duckdb_spark.plans.cbo import JoinGraph

    g = JoinGraph(spark, sf_dir)
    # sel is the bloom filter's expected pass rate — a property of the
    # filter's bit density, not of any column distribution, so no catalog
    # statistic can derive it
    g.fact("lineitem_pre", pre, table="lineitem", sel=0.2)
    g.fact("orders", orders)
    g.edge("lineitem_pre", "l_orderkey", "orders", "o_orderkey")
    return (
        g.plan()
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            money_sum(cents("l_extendedprice") * (100 - cents("l_discount")), 4).alias(
                "revenue"
            ),
        )
        .transform(present_sorted, "o_orderpriority")
    )


@register(
    "q115_session_window_native",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(1e-9 + sum(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc=(
        "Native session_window aggregation (Spark's built-in merging "
        "session operator — one shuffle on user_id, sessions merged inside "
        "the aggregate, no window-function pass), cross-checked against "
        "DuckDB's gaps-and-islands formulation. q59 is the two-window "
        "rewrite of the same semantics; this is the operator-native form "
        "that also runs unchanged under readStream."
    ),
)
def q115_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "value")
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.lit(1e-9) + F.sum("value"), 4).alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
        .transform(present_sorted, "user_id", "session_start")
    )


@register(
    "q116_hll_sketch_rollup",
    oracle=None,  # DataSketches estimate; 5%-tolerance + merge-consistency in pytest
    driver_visible=False,  # engine-native sketch; hash-checked twin q175_hll_register_rollup
    category="relational",
    doc=(
        "Mergeable distinct-count rollup via DataSketches HLL: one sketch "
        "per (day, event_type) — the pre-aggregate a rollup table would "
        "store — then hll_union_agg merges days into per-type totals "
        "WITHOUT rescanning events. At 100 TB this is how distinct-users "
        "dashboards stay incremental: sketches are tiny, associative, and "
        "re-mergeable to any coarser grain."
    ),
)
def q116_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.select(F.to_date("ts").alias("d"), "event_type", "user_id")
        .groupBy("d", "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q175_hll_register_rollup",
    oracle=f"""
    WITH h AS (
        SELECT CAST(ts AS DATE) AS d, event_type,
               {_HLL_SQL_HASH.format(col="user_id")} AS hv
        FROM events
    ),
    regs AS (  -- the stored per-(day,type) register table
        SELECT d, event_type, hv % 64 AS reg,
               {_HLL_SQL_MR}
        FROM h GROUP BY d, event_type, hv % 64
    ),
    merged AS (  -- rollup: register-wise max merges days WITHOUT rescanning
        SELECT event_type, reg, max(mr) AS mr
        FROM regs GROUP BY event_type, reg
    ),
    z AS (
        SELECT event_type,
               {_HLL_SQL_ZS_V}
        FROM merged GROUP BY event_type
    ),
    days AS (
        SELECT event_type, CAST(count(DISTINCT d) AS BIGINT) AS n_days
        FROM regs GROUP BY event_type
    )
    SELECT z.event_type, days.n_days,
           {_HLL_SQL_EST} AS est_users
    FROM z JOIN days USING (event_type)
    ORDER BY event_type
    """,
    category="relational",
    doc=(
        "Mergeable distinct-count rollup on md5-HLL REGISTER TABLES — the "
        "portable form of q116's DataSketches rollup: the per-(day,type) "
        "pre-aggregate is 64 (reg, max-rank) rows, day->type merge is a "
        "register-wise max (associative, no event rescans), and the "
        "estimate is the q61 HyperLogLog formula. Because registers are "
        "plain rows, ANY engine can store, merge, and re-estimate them — "
        "hash-checked against DuckDB end-to-end. The native-sketch twin is "
        "q116, the exact-bitmap twin q117."
    ),
)
def q175_hll_register_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    h = ev.select(
        F.to_date("ts").alias("d"),
        "event_type",
        _hll_hash32(F.col("user_id")),
    )
    regs = (
        h.groupBy("d", "event_type", (F.col("hv") % 64).alias("reg"))
        .agg(_hll_max_rank())
        .localCheckpoint(eager=True)  # the "stored" rollup table; 2 consumers
    )
    merged = regs.groupBy("event_type", "reg").agg(F.max("mr").alias("mr"))
    z = merged.groupBy("event_type").agg(*_hll_zs_v())
    est = _hll_estimate()
    days = regs.select("event_type", "d").distinct().groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    return (
        z.join(days, "event_type")
        .select(
            "event_type",
            "n_days",
            F.round(F.lit(1e-9) + est, 4).alias("est_users"),
        )
        .transform(present_sorted, "event_type")
    )


#: KMV sketch size (bottom-k minima of a uniform 32-bit md5 hash).
_KMV_K = 128


@register(
    "q176_kmv_set_sketches",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        FROM events
    ),
    botk AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h QUALIFY rn <= {_KMV_K}
    ),
    stats AS (
        SELECT event_type, count(*) AS nk, max(hv) AS uk
        FROM botk GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM stats a JOIN stats b ON a.event_type < b.event_type
    ),
    mh AS (
        SELECT ta, tb, hv FROM pairs JOIN botk ON botk.event_type = ta
        UNION
        SELECT ta, tb, hv FROM pairs JOIN botk ON botk.event_type = tb
    ),
    mk AS (
        SELECT ta, tb, hv,
               row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
        FROM mh QUALIFY rn <= {_KMV_K}
    ),
    mstats AS (SELECT ta, tb, count(*) AS kp, max(hv) AS uu FROM mk GROUP BY ta, tb),
    rho AS (
        SELECT mk.ta, mk.tb, count(*) AS both_cnt
        FROM mk
        JOIN botk ka ON ka.event_type = mk.ta AND ka.hv = mk.hv
        JOIN botk kb ON kb.event_type = mk.tb AND kb.hv = mk.hv
        GROUP BY mk.ta, mk.tb
    )
    SELECT ms.ta AS type_a, ms.tb AS type_b,
           round(1e-9 + CASE WHEN sa.nk < {_KMV_K} THEN CAST(sa.nk AS DOUBLE)
                             ELSE {_KMV_K - 1}.0 / (CAST(sa.uk AS DOUBLE) / 4294967296.0) END, 4) AS est_a,
           round(1e-9 + CASE WHEN sb.nk < {_KMV_K} THEN CAST(sb.nk AS DOUBLE)
                             ELSE {_KMV_K - 1}.0 / (CAST(sb.uk AS DOUBLE) / 4294967296.0) END, 4) AS est_b,
           round(1e-9 + CASE WHEN ms.kp < {_KMV_K} THEN CAST(ms.kp AS DOUBLE)
                             ELSE {_KMV_K - 1}.0 / (CAST(ms.uu AS DOUBLE) / 4294967296.0) END, 4) AS est_union,
           round(1e-9 + CAST(coalesce(r.both_cnt, 0) AS DOUBLE) / ms.kp, 4) AS est_jaccard,
           round(1e-9 + (CAST(coalesce(r.both_cnt, 0) AS DOUBLE) / ms.kp)
                 * CASE WHEN ms.kp < {_KMV_K} THEN CAST(ms.kp AS DOUBLE)
                        ELSE {_KMV_K - 1}.0 / (CAST(ms.uu AS DOUBLE) / 4294967296.0) END, 4) AS est_intersection
    FROM mstats ms
    JOIN stats sa ON sa.event_type = ms.ta
    JOIN stats sb ON sb.event_type = ms.tb
    LEFT JOIN rho r ON r.ta = ms.ta AND r.tb = ms.tb
    ORDER BY type_a, type_b
    """,
    category="relational",
    doc=(
        "KMV (bottom-k minimum values) distinct sketches with SET "
        "OPERATIONS — the Theta-sketch capability: per-event-type bottom-128 "
        "md5 hashes estimate distinct users ((k-1)/u_k), sketches MERGE by "
        "re-taking the k smallest of a union (associative), and the merged "
        "sketch yields union size, Jaccard (|K_AB ∩ K_A ∩ K_B| / k), and "
        "intersection estimates per type pair — none of which an HLL can do. "
        "Engine-neutral hashing makes every estimate hash-checkable in "
        "DuckDB. Scale shape: the only corpus-sized step is the DISTINCT "
        "(type, hash) pass; the per-type bottom-k window runs over distinct "
        "users only (at 100 TB you'd swap it for a bounded bottom-k partial "
        "aggregate, keeping k values per partition before the merge — same "
        "estimator, same results, since bottom-k is associative)."
    ),
)
def q176_kmv_set_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    K = _KMV_K
    ev = load_table(spark, "events", sf_dir)
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    botk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
        .localCheckpoint(eager=True)  # ≤ types×K rows; consumed 4 times below
    )
    stats = botk.groupBy("event_type").agg(
        F.count("*").alias("nk"), F.max("hv").alias("uk")
    )
    sa = stats.select(
        F.col("event_type").alias("ta"), F.col("nk").alias("nka"), F.col("uk").alias("uka")
    )
    sb = stats.select(
        F.col("event_type").alias("tb"), F.col("nk").alias("nkb"), F.col("uk").alias("ukb")
    )
    pairs = sa.join(sb, F.col("ta") < F.col("tb"))
    mh = (
        pairs.select("ta", "tb")
        .join(botk, F.col("event_type") == F.col("ta"))
        .select("ta", "tb", "hv")
        .unionByName(
            pairs.select("ta", "tb")
            .join(botk, F.col("event_type") == F.col("tb"))
            .select("ta", "tb", "hv")
        )
        .distinct()
    )
    wp = Window.partitionBy("ta", "tb").orderBy("hv")
    mk = mh.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= K).drop("rn")
    mstats = mk.groupBy("ta", "tb").agg(F.count("*").alias("kp"), F.max("hv").alias("uu"))
    ka = botk.select(F.col("event_type").alias("ta"), F.col("hv").alias("hv"))
    kb = botk.select(F.col("event_type").alias("tb"), F.col("hv").alias("hv"))
    rho = (
        mk.join(ka, ["ta", "hv"])
        .join(kb, ["tb", "hv"])
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("both_cnt"))
    )

    def est(nk, uk):
        return F.when(nk < K, nk.cast("double")).otherwise(
            F.lit(float(K - 1)) / (uk.cast("double") / F.lit(4294967296.0))
        )

    out = (
        mstats.join(pairs, ["ta", "tb"])
        .join(rho, ["ta", "tb"], "left")
        .withColumn("both_d", F.coalesce(F.col("both_cnt"), F.lit(0)).cast("double"))
    )
    est_union = est(F.col("kp"), F.col("uu"))
    jacc = F.col("both_d") / F.col("kp")
    return (
        out.select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.round(F.lit(1e-9) + est(F.col("nka"), F.col("uka")), 4).alias("est_a"),
            F.round(F.lit(1e-9) + est(F.col("nkb"), F.col("ukb")), 4).alias("est_b"),
            F.round(F.lit(1e-9) + est_union, 4).alias("est_union"),
            F.round(F.lit(1e-9) + jacc, 4).alias("est_jaccard"),
            F.round(F.lit(1e-9) + jacc * est_union, 4).alias("est_intersection"),
        )
        .transform(present_sorted, "type_a", "type_b")
    )


@register(
    "q117_bitmap_distinct_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders GROUP BY month
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
    ORDER BY month
    """,
    doc=(
        "EXACT mergeable distinct-count rollup via bitmap aggregates: "
        "per-month bitmaps of the customer-key space (bucketed by "
        "bitmap_bucket_number), monthly distinct = bitmap_count, and the "
        "all-time distinct = bitmap_or_agg of the monthly bitmaps — no "
        "second scan, no approximation. The exact-bitmap twin of q116: "
        "COUNT(DISTINCT) over any date range becomes an OR of stored "
        "bitmaps at 100 TB."
    ),
)
def q117_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    keyed = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
        F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
    )
    per_bucket = keyed.groupBy("month", "bucket").agg(
        F.bitmap_construct_agg(F.col("pos")).alias("bm")
    )
    monthly = per_bucket.groupBy("month").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_distinct")
    )
    overall = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_distinct"))
        .select(F.lit("ALL").alias("month"), "n_distinct")
    )
    return monthly.unionByName(overall).transform(present_sorted, "month")


@register(
    "q118_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k,
             count(*) AS n_orders
      FROM orders GROUP BY k
    ),
    r AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k,
             round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
      FROM orders GROUP BY k
    )
    SELECT l.k AS status_key, CAST(l.n_orders AS BIGINT) AS n_orders, r.total
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    ORDER BY status_key NULLS FIRST
    """,
    doc=(
        "Null-safe equi-join (Spark `<=>` / SQL IS NOT DISTINCT FROM): NULL "
        "keys match each other instead of dropping out — the semantics CDC "
        "and dimension-conform joins need when NULL is a real key value. "
        "Plain equality would silently lose the NULL group on both sides."
    ),
)
def q118_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    k = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    left = orders.groupBy(k.alias("k")).agg(F.count("*").alias("n_orders"))
    right = orders.groupBy(k.alias("k2")).agg(
        F.round(
            F.lit(1e-9) + F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"),
            2,
        ).alias("total")
    )
    return (
        left.join(right, left.k.eqNullSafe(right.k2))
        .select(
            F.col("k").alias("status_key"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "total",
        )
        .transform(present_sorted, F.asc_nulls_first("status_key"))
    )


@register(
    "q119_union_by_name_evolution",
    oracle="""
    WITH old_batch AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer
      WHERE c_custkey % 2 = 0
    ),
    new_batch AS (
      SELECT c_custkey AS custkey,
             round(1e-9 + CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE), 2) AS acctbal,
             c_mktsegment AS segment
      FROM customer WHERE c_custkey % 2 = 1
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(acctbal) AS BIGINT) AS n_with_bal,
           round(1e-9 + coalesce(sum(acctbal), 0.0), 2) AS total_bal
    FROM (
      SELECT custkey, NULL::DOUBLE AS acctbal, segment FROM old_batch
      UNION ALL BY NAME
      SELECT * FROM new_batch
    )
    GROUP BY segment ORDER BY segment
    """,
    doc=(
        "Schema-evolving union: unionByName(allowMissingColumns=True) "
        "aligns batches by COLUMN NAME and nulls the columns a batch "
        "predates (DuckDB's UNION ALL BY NAME) — how a pipeline appends "
        "old- and new-schema micro-batches without positional breakage. "
        "q67 is the on-read (mergeSchema) twin; this is the in-plan form."
    ),
)
def q119_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    old_batch = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    new_batch = cust.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("custkey"),
        F.round(
            F.lit(1e-9) + F.col("c_acctbal").cast("decimal(12,2)").cast("double"), 2
        ).alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    unioned = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return (
        unioned.groupBy("segment")
        .agg(
            F.count("*").alias("n"),
            F.count("acctbal").alias("n_with_bal"),
            F.round(F.lit(1e-9) + F.coalesce(F.sum("acctbal"), F.lit(0.0)), 2).alias(
                "total_bal"
            ),
        )
        .transform(present_sorted, "segment")
    )


@register(
    "q120_variant_semi_structured",
    oracle="""
    SELECT event_type,
           CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT) AS n_valid,
           CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(k) AS BIGINT) AS k_total
    FROM (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "Semi-structured data through the VARIANT type (Spark 4): "
        "parse_json ingests the raw JSON column ONCE into Spark's binary "
        "variant encoding, variant_get extracts typed paths downstream — "
        "the engine-native replacement for per-expression JSON string "
        "re-parsing (q53 is the classic get_json_object form). At 100 TB "
        "the difference is parsing each blob once at ingest vs once per "
        "extracted field per query."
    ),
)
def q120_variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.select("event_type", F.parse_json(F.col("props")).alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_valid"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k").cast("bigint").alias("k_total"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q121_collated_grouping",
    oracle="""
    SELECT lower(seg) AS segment, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    GROUP BY lower(seg) ORDER BY segment
    """,
    doc=(
        "Collation-aware grouping (Spark 4 string collations): a mixed-case "
        "column grouped under UTF8_LCASE merges case variants inside the "
        "hash aggregate itself — no lower() projection, and at scale no "
        "second aggregate over normalized keys; the oracle is the classic "
        "GROUP BY lower() rewrite."
    ),
)
def q121_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    seg = F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")).otherwise(
        F.lower("c_mktsegment")
    )
    return (
        cust.select(F.collate(seg, "UTF8_LCASE").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        # lower() of ANY case-variant representative is the same string, so
        # the output is deterministic even though the retained grouping
        # representative is not; collate back to UTF8_BINARY for a plain
        # string column in the result schema
        .select(F.collate(F.lower("k"), "UTF8_BINARY").alias("segment"), "n")
        .transform(present_sorted, "segment")
    )


@register(
    "q122_linear_interpolation",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, epoch_us(ts) AS t,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 100
    ),
    ctx AS (
      SELECT user_id, ts, t, v,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM base
    )
    SELECT user_id, ts,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap,
           round(1e-9 + CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 6) AS filled
    FROM ctx ORDER BY user_id, ts
    """,
    doc=(
        "Time-series gap repair by linear interpolation: deterministic "
        "holes (every 5th event) are filled from the nearest non-null "
        "neighbors, weighted by microsecond-exact time fraction — four "
        "IGNORE NULLS window lookups over ONE partition ordering (a single "
        "shuffle on user_id), the distributable form of pandas "
        "interpolate(method='time'). Boundary gaps fall back to the one "
        "available neighbor."
    ),
)
def q122_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 100)
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    base = ev.select("user_id", "ts", t.alias("t"), v.alias("v"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = base.select(
        "user_id",
        "ts",
        "t",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("t")), ignorenulls=True)
        .over(wb)
        .alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("t")), ignorenulls=True)
        .over(wf)
        .alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return ctx.select(
        "user_id",
        "ts",
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("bigint").alias("was_gap"),
        F.round(F.lit(1e-9) + filled, 6).alias("filled"),
    ).orderBy("user_id", "ts")


@register(
    "q123_mode_median",
    oracle="""
    WITH cnt AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS c
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    md AS (
      SELECT o_orderpriority, o_orderstatus AS mode_status,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY c DESC, o_orderstatus) AS rn
      FROM cnt
    ),
    med AS (
      SELECT o_orderpriority,
             round(1e-9 + median(o_totalprice), 4) AS median_total,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority
    )
    SELECT med.o_orderpriority, md.mode_status, med.median_total, med.n
    FROM med JOIN md ON med.o_orderpriority = md.o_orderpriority AND md.rn = 1
    ORDER BY med.o_orderpriority
    """,
    doc=(
        "Deterministic MODE (most frequent value, ties → smallest) and "
        "exact interpolated MEDIAN per group. Spark's mode(col, "
        "deterministic=true) pins exactly the tie rule the oracle's "
        "hand-rolled count-window replays; median is percentile(0.5) with "
        "linear interpolation in both engines. One grouped pass for the "
        "mode counts (distinct (group,value) pairs shuffle, not rows) "
        "plus the median's per-group sort — at 100 TB the median would "
        "switch to approx_percentile; this entry pins the exact-path "
        "semantics."
    ),
)
def q123_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.mode("o_orderstatus", True).alias("mode_status"),
            F.round(F.lit(1e-9) + F.median("o_totalprice"), 4).alias("median_total"),
            F.count("*").cast("bigint").alias("n"),
        )
        .transform(present_sorted, "o_orderpriority")
    )


@register(
    "q124_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           round(1e-9 + regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(1e-9 + regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(1e-9 + regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc=(
        "Per-group ordinary-least-squares via the SQL-standard regression "
        "aggregates (regr_slope/intercept/r2/count) — closed-form moment "
        "accumulators in both engines, so one map-side-combined grouped "
        "pass over the scan: fully distributable, no second pass, no "
        "residual materialization."
    ),
)
def q124_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.lit(1e-9) + F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.lit(1e-9) + F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.lit(1e-9) + F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("bigint").alias("n"),
        )
        .transform(present_sorted, "l_returnflag")
    )


PSI_BINS = 10


@register(
    "dq06_psi_drift",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value, epoch_us(ts) AS us
      FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
      SELECT min(us) AS mn, max(us) AS mx, min(value) AS vmin, max(value) AS vmax
      FROM ev
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN us * 2 < mn + mx THEN 'ref' ELSE 'cur' END AS period,
             least({PSI_BINS - 1}, CAST(floor((value - vmin)
                   / ((vmax - vmin) / {PSI_BINS}.0)) AS BIGINT)) AS bin
      FROM ev CROSS JOIN bounds
    ),
    agg1 AS (
      SELECT event_type, bin,
             sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS c_ref,
             sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS c_cur
      FROM binned GROUP BY event_type, bin
    ),
    wn AS (
      SELECT event_type, c_ref, c_cur,
             sum(c_ref) OVER (PARTITION BY event_type) AS t_ref,
             sum(c_cur) OVER (PARTITION BY event_type) AS t_cur,
             count(*) OVER (PARTITION BY event_type) AS n_obs
      FROM agg1
    )
    SELECT event_type,
           round(1e-9
                 + sum(((c_cur + 0.5) / (t_cur + {PSI_BINS} * 0.5)
                        - (c_ref + 0.5) / (t_ref + {PSI_BINS} * 0.5))
                       * ln(((c_cur + 0.5) / (t_cur + {PSI_BINS} * 0.5))
                            / ((c_ref + 0.5) / (t_ref + {PSI_BINS} * 0.5))))
                 + max(({PSI_BINS} - n_obs)
                       * ((0.5 / (t_cur + {PSI_BINS} * 0.5) - 0.5 / (t_ref + {PSI_BINS} * 0.5))
                          * ln((0.5 / (t_cur + {PSI_BINS} * 0.5))
                               / (0.5 / (t_ref + {PSI_BINS} * 0.5))))), 6) AS psi,
           CAST(max(t_ref) AS BIGINT) AS n_ref,
           CAST(max(t_cur) AS BIGINT) AS n_cur
    FROM wn
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=(
        "Population Stability Index per event_type — the standard "
        "drift-detection statistic between a reference window (first half "
        "of the time range) and the current window. Deterministic binning: "
        f"{PSI_BINS} equal-width bins over the global value range (pure "
        "IEEE double arithmetic, identical in both engines), Laplace-"
        "smoothed probabilities so empty bins never produce ln(0). Scale "
        "shape: one grouped count per (type, period, bin) with map-side "
        "combine — the PSI itself runs over (types × bins) rows, i.e. "
        "nothing, regardless of event volume."
    ),
)
def dq06_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    bounds = F.broadcast(
        ev.agg(
            F.min("us").alias("mn"),
            F.max("us").alias("mx"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    binned = ev.crossJoin(bounds).select(
        "event_type",
        F.when(F.col("us") * 2 < F.col("mn") + F.col("mx"), "ref")
        .otherwise("cur")
        .alias("period"),
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / ((F.col("vmax") - F.col("vmin")) / float(PSI_BINS))
            ).cast("bigint"),
        ).alias("bin"),
    )
    # One pivoted aggregation over (type, bin): the ref/cur split is a
    # conditional count, so events are aggregated exactly once; per-type
    # totals come from a window over the (types × bins)-sized aggregate,
    # not a self-join (self-referencing an aggregate duplicates its whole
    # subtree in the physical plan — measured 20 parquet scans in the
    # join-based formulation vs 2 here: bounds + the main pass).
    from pyspark.sql import Window

    agg1 = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("c_cur"),
    )
    wt = Window.partitionBy("event_type")
    smooth = PSI_BINS * 0.5
    withtot = agg1.select(
        "event_type",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(wt).alias("t_ref"),
        F.sum("c_cur").over(wt).alias("t_cur"),
        F.count("*").over(wt).alias("n_obs"),
    )
    p_ref = (F.col("c_ref") + 0.5) / (F.col("t_ref") + smooth)
    p_cur = (F.col("c_cur") + 0.5) / (F.col("t_cur") + smooth)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    # Bins empty in BOTH periods never appear in agg1; their Laplace term
    # is a per-type constant, added analytically instead of materializing
    # a bin frame — the PSI is identical, the plan stays one linear
    # pipeline.
    p0_ref = F.lit(0.5) / (F.col("t_ref") + smooth)
    p0_cur = F.lit(0.5) / (F.col("t_cur") + smooth)
    term0 = (p0_cur - p0_ref) * F.log(p0_cur / p0_ref)
    missing = (F.lit(PSI_BINS) - F.col("n_obs")).cast("double") * term0
    return (
        withtot.groupBy("event_type")
        .agg(
            F.round(F.lit(1e-9) + F.sum(term) + F.first(missing), 6).alias("psi"),
            F.first("t_ref").cast("bigint").alias("n_ref"),
            F.first("t_cur").cast("bigint").alias("n_cur"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q125_try_functions",
    oracle="""
    SELECT o_orderpriority,
           CAST(TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS BIGINT) AS pr_num,
           CAST(count(TRY_CAST(o_orderpriority AS INTEGER)) AS BIGINT) AS n_castable,
           CAST(count(CASE WHEN o_orderkey % 2 = 0 THEN NULL
                           ELSE o_totalprice / (o_orderkey % 2) END) AS BIGINT) AS n_div_ok,
           CAST(count((regexp_split_to_array(o_orderpriority, '-'))[5]) AS BIGINT) AS n_elem5,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Error-safe expression surface: try_cast (malformed string → NULL, "
        "prefix digit → value), try_divide (÷0 → NULL, never an exception "
        "— half the derived denominators are zero), try_element_at past "
        "the end of an array → NULL. The oracle spells each as DuckDB's native "
        "equivalent (TRY_CAST, guarded CASE, out-of-bounds list index). "
        "Pure codegen over one grouped scan; at 100 TB the try_ forms are "
        "what keeps a single malformed row from killing a 10-hour job "
        "under ANSI mode."
    ),
)
def q125_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    parts = F.split(F.col("o_orderpriority"), "-")
    # pr_num and n_castable are deterministic functions of the GROUP KEY,
    # and n_castable's try_cast FAILS on every row ("1-URGENT" is not an
    # int): a failing ANSI string→int cast constructs a formatted JVM
    # error per row (~9 µs measured — count(try_cast(key)) 1.40 s vs
    # count(*) 0.16 s on 150k rows at sf0.1). Both move AFTER the
    # aggregation, once per group (guide §1.2). Exact equivalence: the
    # key is constant within a group, so first(f(key)) = f(key) and
    # count(f(key)) = count(*) if f(key) IS NOT NULL else 0 (the NULL-key
    # group gives f(NULL) = NULL → 0 either way). try_divide and
    # try_element_at stay per-row: measured at baseline cost (÷0 and
    # out-of-bounds take non-exception paths).
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 2))
            .cast("bigint")
            .alias("n_div_ok"),
            F.count(F.try_element_at(parts, F.lit(5))).cast("bigint").alias("n_elem5"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            "o_orderpriority",
            F.try_element_at(parts, F.lit(1)).try_cast("int").cast("bigint").alias(
                "pr_num"
            ),
            F.when(
                F.col("o_orderpriority").try_cast("int").isNotNull(), F.col("n")
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("n_castable"),
            "n_div_ok",
            "n_elem5",
            "n",
        )
        .transform(present_sorted, "o_orderpriority")
    )


@register(
    "dq07_fd_audit",
    oracle="""
    WITH cands AS (
      SELECT 'orders' AS tbl, 'o_custkey->o_orderpriority' AS fd,
             CAST(count(*) AS BIGINT) AS n_lhs,
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_rhs
            FROM orders GROUP BY o_custkey)
      UNION ALL
      SELECT 'orders', 'o_orderkey->o_orderstatus',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT o_orderkey, count(DISTINCT o_orderstatus) AS n_rhs
            FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'lineitem', 'l_orderkey->l_returnflag',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS n_rhs
            FROM lineitem GROUP BY l_orderkey)
      UNION ALL
      SELECT 'lineitem', 'l_partkey->l_suppkey',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS n_rhs
            FROM lineitem GROUP BY l_partkey)
    )
    SELECT tbl, fd, n_lhs, n_violating,
           CAST(n_violating = 0 AS BOOLEAN) AS holds
    FROM cands ORDER BY tbl, fd
    """,
    doc=(
        "Functional-dependency audit — schema profiling that tells a "
        "pipeline which columns are safe dedup/partition keys: for each "
        "candidate LHS→RHS, count LHS groups carrying more than one "
        "distinct RHS. o_orderkey→o_orderstatus holds (key FD); the "
        "others measure real violation counts. Each candidate is one "
        "grouped distinct-count with map-side combine; candidates on the "
        "same table are separate aggregations by different keys, so the "
        "per-table scan count equals the candidate count (inherent: "
        "different shuffle keys cannot share an exchange)."
    ),
)
def dq07_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(tbl: str, lhs: str, rhs: str) -> DataFrame:
        t = load_table(spark, tbl, sf_dir)
        per = t.groupBy(lhs).agg(F.count_distinct(F.col(rhs)).alias("n_rhs"))
        return per.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count("*").cast("bigint").alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
        )
    out = (
        audit("orders", "o_custkey", "o_orderpriority")
        .unionByName(audit("orders", "o_orderkey", "o_orderstatus"))
        .unionByName(audit("lineitem", "l_orderkey", "l_returnflag"))
        .unionByName(audit("lineitem", "l_partkey", "l_suppkey"))
    )
    return out.select(
        "tbl", "fd", "n_lhs", "n_violating", (F.col("n_violating") == 0).alias("holds")
    ).transform(present_sorted, "tbl", "fd")


@register(
    "q126_higher_moments",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DECIMAL(6,0)) AS cd
      FROM events WHERE value IS NOT NULL
    ),
    sums AS (
      SELECT event_type,
             count(*) AS n,
             sum(cd) AS s1,
             sum(CAST(cd AS DECIMAL(18,0)) * cd) AS s2,
             sum(CAST(cd AS DECIMAL(18,0)) * cd * cd) AS s3,
             sum(CAST(cd AS DECIMAL(20,0)) * cd * cd * cd) AS s4
      FROM c GROUP BY event_type
    ),
    mom AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS m,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM sums
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(1e-9 + m / 100, 4) AS mean_value,
           round(1e-9 + sqrt(r2 - m * m) / 100, 4) AS stddev_pop,
           round(1e-9 + (r3 - 3 * m * r2 + 2 * m * m * m)
                 / (sqrt(r2 - m * m) * (r2 - m * m)), 6) AS skewness,
           round(1e-9 + (r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m)
                 / ((r2 - m * m) * (r2 - m * m)) - 3, 6) AS excess_kurtosis
    FROM mom ORDER BY event_type
    """,
    doc=(
        "Higher central moments (population skewness / excess kurtosis) "
        "per event_type from DECIMAL-EXACT power sums: values are 2-dp "
        "money-like doubles, so integer-cents powers Σc..Σc⁴ accumulate "
        "exactly (order-independent) in both engines and the double-space "
        "moment algebra is bit-identical — the native skewness()/"
        "kurtosis() aggregates differ between engines in bias correction "
        "AND merge order, which is why they are avoided. Skew/kurtosis "
        "are scale-invariant, so cents-space equals value-space. One "
        "grouped pass, map-side combined."
    ),
)
def q126_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    cd = (F.col("value").cast("decimal(12,2)") * 100).cast("decimal(6,0)")
    sums = ev.select("event_type", cd.alias("cd")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cd").alias("s1"),
        F.sum(F.col("cd") * F.col("cd")).alias("s2"),
        F.sum(F.col("cd") * F.col("cd") * F.col("cd")).alias("s3"),
        F.sum(F.col("cd") * F.col("cd") * F.col("cd") * F.col("cd")).alias("s4"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    var = r2 - m * m
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.lit(1e-9) + m / 100, 4).alias("mean_value"),
        F.round(F.lit(1e-9) + F.sqrt(var) / 100, 4).alias("stddev_pop"),
        F.round(
            F.lit(1e-9) + (r3 - 3 * m * r2 + 2 * m * m * m) / (F.sqrt(var) * var), 6
        ).alias("skewness"),
        F.round(
            F.lit(1e-9)
            + (r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m) / (var * var)
            - 3,
            6,
        ).alias("excess_kurtosis"),
    ).transform(present_sorted, "event_type")


@register(
    "q127_observed_pipeline",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc=(
        "Pipeline observability: the aggregation runs under a named "
        "Observation (Spark's observe() metric channel), which records "
        "input-row counts and value sums DURING the pass — zero extra "
        "scans or actions, the production pattern for emitting data-"
        "quality counters from ETL jobs without separate audit queries. "
        "observe() is transparent to results, so the DuckDB oracle checks "
        "the query output; pytest asserts the captured metrics equal the "
        "aggregate's own answers."
    ),
)
def q127_observed_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    obs = Observation("q127_metrics")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("price_sum"),
    )
    result = (
        observed.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.lit(1e-9)
                + F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("total"),
        )
        .transform(present_sorted, "o_orderstatus")
    )
    # stash the Observation on the DataFrame for tests; harmless otherwise
    result._hds_observation = obs  # type: ignore[attr-defined]
    return result


@register(
    "dq08_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, value,
             median(value) OVER (PARTITION BY event_type) AS med
      FROM events WHERE value IS NOT NULL
    ),
    mad AS (
      SELECT event_type, value, med,
             median(abs(value - med)) OVER (PARTITION BY event_type) AS mad
      FROM med
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + max(med), 4) AS med,
           round(1e-9 + max(mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(round(1e-9 + 0.6745 * (value - med) / mad, 4)) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM mad GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "Robust outlier detection via the median absolute deviation "
        "(modified z-score 0.6745·(x−med)/MAD > 3.5, the Iglewicz–Hoaglin "
        "rule) — unlike dq01's mean/σ z-scores, MAD doesn't let the "
        "outliers inflate their own threshold. Shape: ONE events scan and "
        "one event_type shuffle — med and MAD are CHAINED median windows "
        "over the same partition (no per-statistic re-aggregation or "
        "join-back); medians interpolate identically in both engines and "
        "the modified z is compared on its 4dp rounding so the outlier "
        "count is engine-stable."
    ),
)
def dq08_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    wt = Window.partitionBy("event_type")
    staged = ev.select("event_type", "value").withColumn(
        "med", F.median("value").over(wt)
    )
    staged = staged.withColumn("mad", F.median(F.abs(F.col("value") - F.col("med"))).over(wt))
    rz = F.round(
        F.lit(1e-9) + 0.6745 * (F.col("value") - F.col("med")) / F.col("mad"), 4
    )
    return (
        staged.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.lit(1e-9) + F.max("med"), 4).alias("med"),
            F.round(F.lit(1e-9) + F.max("mad"), 4).alias("mad"),
            F.sum(F.when(F.abs(rz) > 3.5, 1).otherwise(0)).cast("bigint").alias(
                "n_outliers"
            ),
        )
        .transform(present_sorted, "event_type")
    )


INC_CUTOFF = "1997-01-01"


@register(
    "q128_incremental_rollup",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 4) AS avg_price,
           round(1e-9 + max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Incremental view maintenance: the rollup is computed as "
        f"PRE-CUTOFF PARTIAL ⊕ DELTA PARTIAL (cutoff {INC_CUTOFF}) — each "
        "side carries only mergeable state (count, decimal-exact sum, "
        "max), and AVG is derived from the merged sums, never averaged "
        "across partials. The oracle is the one-shot full aggregate: "
        "merge(partial(a), partial(b)) == aggregate(a ∪ b) is exactly the "
        "contract that lets a 100 TB daily rollup absorb each day's "
        "increment without rescanning history. Both sides aggregate "
        "map-side; the merge runs over groups×2 rows."
    ),
)
def q128_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cutoff = F.lit(INC_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("psum"),
            F.max("o_totalprice").alias("pmax"),
        )

    hist = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        hist.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("psum").alias("total_dec"),
            F.max("pmax").alias("max_price_raw"),
        )
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.lit(1e-9) + F.col("total_dec").cast("double"), 2).alias("total"),
        F.round(
            F.lit(1e-9) + F.col("total_dec").cast("double") / F.col("n"), 4
        ).alias("avg_price"),
        F.round(F.lit(1e-9) + F.col("max_price_raw"), 2).alias("max_price"),
    ).transform(present_sorted, "o_orderpriority")


@register(
    "q129_numeric_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(count(*) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
           ) AS BIGINT) AS n_within_1k,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS trailing_1k_sum
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_totalprice, o_orderkey
    """,
    doc=(
        "Numeric RANGE window frames (value-based, not row-based): for "
        "each order, how many orders fall within ±1000 of its price and "
        "the decimal-exact sum of the trailing 1000-wide band — the "
        "price-banding / peer-group analytic. RANGE frames bound by "
        "VALUE distance are the frame mode q29's time-RANGE entry covers "
        "for timestamps; this pins the numeric form. One sort shuffle on "
        "the ordering key."
    ),
)
def q129_numeric_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 2000)
    wboth = Window.orderBy("o_totalprice").rangeBetween(-1000, 1000)
    wtrail = Window.orderBy("o_totalprice").rangeBetween(-1000, Window.currentRow)
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.count("*").over(wboth).cast("bigint").alias("n_within_1k"),
            F.round(
                F.lit(1e-9)
                + F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .over(wtrail)
                .cast("double"),
                2,
            ).alias("trailing_1k_sum"),
        )
        .transform(ordered_wide, "o_totalprice", "o_orderkey")
    )


@register(
    "q130_asof_join_native_oracle",
    oracle="""
    WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.user_id, p.event_id AS purchase_event_id, v.ts AS view_ts,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS secs_since_view
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.user_id, purchase_event_id
    """,
    doc=(
        "AS-OF LEFT JOIN checked against DuckDB's NATIVE `ASOF LEFT JOIN` "
        "operator (q80's oracle replays the window formulation; here the "
        "oracle is the engine-native implementation, so the Spark "
        "union-and-carry rewrite is proven equivalent to the real thing, "
        "unmatched rows and >= tie semantics included). Scale shape "
        "unchanged: one user_id shuffle, no pairwise inequality join."
    ),
)
def q130_asof_join_native_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit("p").alias("side")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit("v").alias("side")
    )
    tagged = purchases.unionByName(views)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("side").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "view_ts",
        F.last(F.when(F.col("side") == "v", F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("side") == "p")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            "view_ts",
            (F.unix_timestamp("ts") - F.unix_timestamp("view_ts"))
            .cast("bigint")
            .alias("secs_since_view"),
        )
        .transform(ordered_wide, "user_id", "purchase_event_id")
    )


@register(
    "q131_qualify_topn",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
    doc=(
        "Top-N-per-group via the QUALIFY clause — DuckDB's native "
        "window-filter syntax is the oracle; Spark (which has no QUALIFY) "
        "expresses the identical semantics as window + filter, the "
        "mechanical rewrite a migrating user applies. Plan: one "
        "partitioned window, filter before any ordering."
    ),
)
def q131_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .transform(present_sorted, "o_orderpriority", F.desc("o_totalprice"), "o_orderkey")
    )


@register(
    "q132_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_orderpriority)
           o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
    doc=(
        "DISTINCT ON — DuckDB/Postgres's pick-first-row-per-group "
        "shorthand, run natively as the oracle; Spark expresses the "
        "identical deterministic semantics with a row_number window "
        "(rn = 1 under the same ordering). The ordering includes a unique "
        "key so 'first' is well-defined on both engines."
    ),
)
def q132_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .transform(present_sorted, "o_orderpriority")
    )


@register(
    "dq09_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    cnt AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS t FROM cnt)
    SELECT d,
           CAST(n AS BIGINT) AS n,
           round(1e-9 + CAST(n AS DOUBLE) / t, 6) AS observed,
           round(1e-9 + log10(1.0 + 1.0 / d), 6) AS benford,
           round(1e-9 + (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / d))
                 * (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / d))
                 / log10(1.0 + 1.0 / d), 8) AS chi2_term
    FROM cnt CROSS JOIN tot
    ORDER BY d
    """,
    doc=(
        "Benford's-law first-digit audit on order totals — the classic "
        "fabricated-data screen: observed first-digit shares vs the "
        "log10(1+1/d) expectation with per-digit chi-square contributions. "
        "First digit extracted from the DECIMAL string form (identical "
        "canonical rendering in both engines — double formatting is not). "
        "One scan, a 9-row aggregate, and a broadcast total."
    ),
)
def dq09_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
    ).cast("bigint")
    cnt = orders.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    # 9-row aggregate: the global total as a window is free here
    wt = Window.partitionBy()
    obs = F.col("n").cast("double") / F.sum("n").over(wt)
    ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        cnt.select(
            "d",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.lit(1e-9) + obs, 6).alias("observed"),
            F.round(F.lit(1e-9) + ben, 6).alias("benford"),
            F.round(F.lit(1e-9) + (obs - ben) * (obs - ben) / ben, 8).alias(
                "chi2_term"
            ),
        )
        .transform(present_sorted, "d")
    )


@register(
    "q133_star_modifiers",
    oracle="""
    SELECT * EXCLUDE (o_comment_hash)
    FROM (
      SELECT o_orderkey, o_orderstatus,
             round(1e-9 + CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 2) AS price,
             md5(o_orderpriority) AS o_comment_hash
      FROM orders WHERE o_orderkey < 100
    )
    ORDER BY o_orderkey
    """,
    doc=(
        "Star modifiers: DuckDB's `* EXCLUDE (col)` vs Spark 4's "
        "`* EXCEPT (col)` — both engines run their NATIVE star-pruning "
        "syntax over the same projection, the quality-of-life construct "
        "migrating analysts ask about first. Column pruning means the "
        "excluded expression never executes in either engine."
    ),
)
def q133_star_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.session import load_tables

    load_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT * EXCEPT (o_comment_hash)
        FROM (
          SELECT o_orderkey, o_orderstatus,
                 round(1e-9 + CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 2) AS price,
                 md5(o_orderpriority) AS o_comment_hash
          FROM orders WHERE o_orderkey < 100
        )
        ORDER BY o_orderkey
        """
    )


@register(
    "dq10_expectation_suite",
    oracle="""
    WITH checks AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n_rows,
        sum(CASE WHEN event_id IS NOT NULL THEN 1 ELSE 0 END) AS c1,
        sum(CASE WHEN value IS NULL OR value >= 0 THEN 1 ELSE 0 END) AS c2,
        sum(CASE WHEN event_type IN ('view','click','purchase','signup','error')
                 THEN 1 ELSE 0 END) AS c3,
        sum(CASE WHEN ts >= TIMESTAMP '2020-01-01' AND ts < TIMESTAMP '2030-01-01'
                 THEN 1 ELSE 0 END) AS c4,
        sum(CASE WHEN user_id >= 0 THEN 1 ELSE 0 END) AS c5
      FROM events
    )
    SELECT rule, n_rows, CAST(n_pass AS BIGINT) AS n_pass,
           CAST(n_rows - n_pass AS BIGINT) AS n_fail,
           n_pass = n_rows AS passed
    FROM checks,
         (VALUES ('event_id_not_null', 1), ('value_non_negative', 2),
                 ('event_type_in_domain', 3), ('ts_in_range', 4),
                 ('user_id_non_negative', 5)) AS r(rule, i),
         LATERAL (SELECT CASE i WHEN 1 THEN c1 WHEN 2 THEN c2 WHEN 3 THEN c3
                               WHEN 4 THEN c4 ELSE c5 END AS n_pass) x
    ORDER BY rule
    """,
    doc=(
        "Expectation-suite validation (the Great-Expectations pattern as "
        "a query): a declared set of rules — not-null, domain membership, "
        "range, sign — evaluated as conditional sums in ONE pass over the "
        "table, unpivoted to a per-rule pass/fail report. Adding a rule "
        "adds a column to the single aggregate, never another scan; at "
        "100 TB the suite costs exactly one map-side-combined aggregation "
        "however many expectations it carries."
    ),
)
def dq10_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    rules = [
        ("event_id_not_null", F.col("event_id").isNotNull()),
        ("value_non_negative", F.col("value").isNull() | (F.col("value") >= 0)),
        (
            "event_type_in_domain",
            F.col("event_type").isin("view", "click", "purchase", "signup", "error"),
        ),
        (
            "ts_in_range",
            (F.col("ts") >= F.lit("2020-01-01").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2030-01-01").cast("timestamp_ntz")),
        ),
        ("user_id_non_negative", F.col("user_id") >= 0),
    ]
    agg = ev.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"pass_{name}")
            for name, pred in rules
        ],
    )
    report = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"pass_{name}").cast("bigint").alias("n_pass"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("r")
    ).select(
        "r.rule",
        "r.n_rows",
        "r.n_pass",
        (F.col("r.n_rows") - F.col("r.n_pass")).cast("bigint").alias("n_fail"),
        (F.col("r.n_pass") == F.col("r.n_rows")).alias("passed"),
    )
    return report.transform(present_sorted, "rule")


@register(
    "q134_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events WHERE value IS NOT NULL
    ),
    weighted AS (
      SELECT user_id, value,
             CAST(epoch_us(next_ts) - epoch_us(ts) AS DOUBLE) / 1000000.0 AS w
      FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(1e-9 + sum(value * w) / sum(w), 6) AS twap,
           round(1e-9 + avg(value), 6) AS plain_avg
    FROM weighted
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc=(
        "Time-weighted average (TWAP): each observation holds until the "
        "next one, so its weight is the interval length — the correct "
        "mean for irregularly-sampled series where the plain average "
        "over-counts bursts (both are reported so the bias is visible). "
        "lead() over the user timeline gives interval ends in the same "
        "one-shuffle pass as the aggregation; microsecond-exact integer "
        "interval lengths before the double division keep both engines "
        "identical."
    ),
)
def q134_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.unix_micros(F.lead(F.col("ts").cast("timestamp")).over(w)).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    wt = (F.col("next_us") - F.col("us")).cast("double") / 1000000.0
    return (
        seq.select("user_id", "value", wt.alias("w"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("value") * F.col("w")) / F.sum("w"), 6
            ).alias("twap"),
            F.round(F.lit(1e-9) + F.avg("value"), 6).alias("plain_avg"),
        )
        .transform(present_sorted, "user_id")
    )
