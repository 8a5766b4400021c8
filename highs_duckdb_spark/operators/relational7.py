"""Round-2 additions: equi-width histogram with CDF, and a snapshot diff
(table-version CDC classification) — both oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.functions.money import cents
from highs_duckdb_spark.functions.presentation import ordered_wide, present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.plans.strategy import fact_hint
from highs_duckdb_spark.session import load_table

N_BUCKETS = 20


@register(
    "q143_equiwidth_histogram",
    oracle=f"""
    WITH bounds AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
    bucketed AS (
      SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / {N_BUCKETS})) AS BIGINT),
                   {N_BUCKETS - 1}) AS bucket
      FROM orders CROSS JOIN bounds),
    counts AS (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket)
    SELECT bucket, cnt,
           CAST(sum(cnt) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
           round(1e-9 + CAST(sum(cnt) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(sum(cnt) OVER () AS DOUBLE), 6) AS cdf
    FROM counts ORDER BY bucket
    """,
    doc=(
        f"Equi-width {N_BUCKETS}-bucket histogram of order totals with the "
        "empirical CDF: one min/max pass broadcast into the bucketing scan, "
        "one bucket-keyed count with map-side combine, then cumulative "
        "windows over the bucket-count table only (20 rows at any data "
        "size). Bucket edges are the identical double arithmetic in both "
        "engines, and counts stay integer through the CDF division."
    ),
)
def q143_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / N_BUCKETS)
        ).cast("bigint"),
        F.lit(N_BUCKETS - 1),
    )
    counts = (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return (
        counts.select(
            "bucket",
            "cnt",
            F.sum("cnt").over(w_cum).cast("bigint").alias("cum_cnt"),
            F.round(
                F.lit(1e-9)
                + F.sum("cnt").over(w_cum).cast("double")
                / F.sum("cnt").over(w_all).cast("double"),
                6,
            ).alias("cdf"),
        )
        .transform(present_sorted, "bucket")
    )


@register(
    "q144_snapshot_diff",
    oracle="""
    WITH v0 AS (
      SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderkey % 7 <> 0),
    v1 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 5 <> 0),
    diff AS (
      SELECT CASE WHEN v0.o_orderkey IS NULL THEN 'added'
                  WHEN v1.o_orderkey IS NULL THEN 'deleted'
                  WHEN v0.price <> v1.price THEN 'modified'
                  ELSE 'unchanged' END AS change_type,
             coalesce(v1.price, 0) - coalesce(v0.price, 0) AS delta
      FROM v0 FULL OUTER JOIN v1 ON v0.o_orderkey = v1.o_orderkey)
    SELECT change_type, count(*) AS n,
           round(1e-9 + CAST(sum(CAST(floor(delta*100 + 0.5) AS BIGINT)) AS DOUBLE)/100, 2)
             AS total_delta
    FROM diff GROUP BY change_type ORDER BY change_type
    """,
    doc=(
        "Snapshot diff (time-travel CDC classification): two derived table "
        "versions are reconciled with one co-partitioned FULL OUTER join on "
        "the key and each row classified added / deleted / modified / "
        "unchanged, with the exact net value delta per class (integer "
        "cents). This is the lakehouse table_changes() pattern; at 100 TB "
        "the join is the only shuffle and AQE handles version-skew. Both "
        "snapshots derive deterministically from the orders table so the "
        "oracle runs the identical reconciliation."
    ),
)
def q144_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    v0 = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k0"), F.col("o_totalprice").alias("p0")
    )
    v1 = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k1"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("p1"),
    )
    change = (
        F.when(F.col("k0").isNull(), "added")
        .when(F.col("k1").isNull(), "deleted")
        .when(F.col("p0") != F.col("p1"), "modified")
        .otherwise("unchanged")
    )
    delta = F.coalesce(F.col("p1"), F.lit(0.0)) - F.coalesce(F.col("p0"), F.lit(0.0))
    return (
        v0.join(fact_hint(v1, sf_dir), F.col("k0") == F.col("k1"), "full_outer")
        .select(change.alias("change_type"), delta.alias("delta"))
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9) + F.sum(cents(F.col("delta"))).cast("double") / 100, 2
            ).alias("total_delta"),
        )
        .transform(present_sorted, "change_type")
    )


@register(
    "q145_groups_frame",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, CAST(ts AS DATE) AS day,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
             dense_rank() OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)) AS grp
      FROM events)
    SELECT user_id, event_id,
           round(1e-9 + CAST(sum(vc) OVER w AS DOUBLE)/100, 2) AS grp_sum,
           CAST(count(*) OVER w AS BIGINT) AS grp_n
    FROM g
    WINDOW w AS (PARTITION BY user_id ORDER BY grp
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ORDER BY user_id, event_id
    """,
    doc=(
        "GROUPS-mode window frame (sum/count over the previous, current, "
        "and next ORDER-BY tie group — here: per-user adjacent calendar "
        "days) via the standard rewrite neither engine needs native GROUPS "
        "support for: dense_rank() numbers the tie groups, then a numeric "
        "RANGE frame of ±1 on the rank IS the GROUPS frame. Two windows "
        "over one user-keyed shuffle; integer-cents sums keep both engines "
        "bit-identical."
    ),
)
def q145_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w_rank = Window.partitionBy("user_id").orderBy(F.col("ts").cast("date"))
    g = ev.select(
        "user_id",
        "event_id",
        cents("value").alias("vc"),
        F.dense_rank().over(w_rank).alias("grp"),
    )
    w = Window.partitionBy("user_id").orderBy("grp").rangeBetween(-1, 1)
    return (
        g.select(
            "user_id",
            "event_id",
            F.round(F.lit(1e-9) + F.sum("vc").over(w).cast("double") / 100, 2).alias(
                "grp_sum"
            ),
            F.count("*").over(w).cast("bigint").alias("grp_n"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q146_listagg_distinct",
    oracle="""
    SELECT p_brand,
           string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
           CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    doc=(
        "LISTAGG(DISTINCT ... ORDER BY ...): DuckDB runs its native ordered "
        "distinct string_agg; Spark has no DISTINCT in string aggregation, "
        "so the equivalent is collect_set → array_sort → array_join — "
        "set-dedup happens map-side in the aggregate buffer, the sort "
        "touches only the per-group distinct values."
    ),
)
def q146_listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return (
        part.groupBy("p_brand")
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), ",").alias("types"),
            F.count_distinct("p_type").cast("bigint").alias("n_types"),
        )
        .transform(present_sorted, "p_brand")
    )


@register(
    "q147_seasonal_index",
    oracle="""
    WITH base AS (
      SELECT event_type, isodow(ts) AS dow,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
      FROM events),
    per_dow AS (
      SELECT event_type, dow, count(*) AS n, sum(vc) AS s
      FROM base GROUP BY event_type, dow),
    per_type AS (
      SELECT event_type, sum(n) AS n_all, sum(s) AS s_all
      FROM per_dow GROUP BY event_type)
    SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow, CAST(d.n AS BIGINT) AS n,
           round(1e-9 + (CAST(d.s AS DOUBLE) / (100*d.n))
                 / (CAST(t.s_all AS DOUBLE) / (100*t.n_all)), 6) AS seasonal_index
    FROM per_dow d JOIN per_type t USING (event_type)
    ORDER BY event_type, dow
    """,
    doc=(
        "Day-of-week seasonal index per event type (dow average value over "
        "the type's overall average — the classic ratio-to-moving-average "
        "seasonality profile, simplified to a stable-period index). "
        "Integer-cents sums keep both engines bit-identical through the "
        "two divisions; ISO day numbering (Spark weekday()+1 == DuckDB "
        "isodow). One grouped pass, the index math runs over types×7 rows."
    ),
)
def q147_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_type",
        (F.weekday(F.col("ts").cast("timestamp")) + 1).alias("dow"),
        cents("value").alias("vc"),
    )
    per_dow = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"), F.sum("vc").alias("s")
    )
    per_type = per_dow.groupBy("event_type").agg(
        F.sum("n").alias("n_all"), F.sum("s").alias("s_all")
    )
    return (
        per_dow.join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            F.col("dow").cast("bigint").alias("dow"),
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.lit(1e-9)
                + (F.col("s").cast("double") / (100 * F.col("n")))
                / (F.col("s_all").cast("double") / (100 * F.col("n_all"))),
                6,
            ).alias("seasonal_index"),
        )
        .transform(present_sorted, "event_type", "dow")
    )


@register(
    "dq12_gap_detection",
    oracle="""
    WITH hours AS (
      SELECT DISTINCT event_type,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS h
      FROM events),
    gaps AS (
      SELECT event_type,
             h - lag(h) OVER (PARTITION BY event_type ORDER BY h) - 1 AS gap
      FROM hours)
    SELECT event_type,
           CAST(count(*) + 1 AS BIGINT) AS hours_present,
           CAST(coalesce(sum(gap), 0) AS BIGINT) AS hours_missing,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_hours
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    category="quality",
    doc=(
        "Missing-data run detection per event type at hourly granularity: "
        "distinct observed hours, lag() the previous hour to size each gap "
        "(gaps-and-islands), report total missing hours and the longest "
        "outage between first and last observation. The window runs over "
        "the DISTINCT (type, hour) table — hours-cardinality data, not the "
        "fact table — and integer hour indices keep both engines exact."
    ),
)
def dq12_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hours = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(cast(date_trunc('hour', cast(ts as timestamp)) as timestamp))"
                " div 3600000000"
            ).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    gaps = hours.select(
        "event_type", (F.col("h") - F.lag("h").over(w) - 1).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            (F.count("*") + 1).cast("bigint").alias("hours_present"),
            F.coalesce(F.sum("gap"), F.lit(0)).cast("bigint").alias("hours_missing"),
            F.coalesce(F.max("gap"), F.lit(0)).cast("bigint").alias("longest_gap_hours"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q148_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY o_orderpriority, month)
    SELECT o_orderpriority, month,
           round(1e-9 + CAST(rev_c AS DOUBLE)/100, 2) AS revenue,
           round(1e-9 + (CAST(rev_c AS DOUBLE)
                 - CAST(lag(rev_c) OVER w AS DOUBLE))
                 / CAST(lag(rev_c) OVER w AS DOUBLE), 6) AS mom_growth
    FROM monthly
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
    ORDER BY o_orderpriority, month
    """,
    doc=(
        "Month-over-month growth per order priority — the standard "
        "period-over-period reporting window. The lag() runs over the "
        "monthly aggregate (priorities × months rows), never the fact "
        "table; integer-cents revenue keeps both engines exact through "
        "the growth division (first month NULL on both sides)."
    ),
)
def q148_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("rev_c").over(w)
    return (
        monthly.select(
            "o_orderpriority",
            "month",
            F.round(F.lit(1e-9) + F.col("rev_c").cast("double") / 100, 2).alias(
                "revenue"
            ),
            F.round(
                F.lit(1e-9)
                + (F.col("rev_c").cast("double") - prev.cast("double"))
                / prev.cast("double"),
                6,
            ).alias("mom_growth"),
        )
        .transform(present_sorted, "o_orderpriority", "month")
    )


@register(
    "q150_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, isodow(ts) AS dow, count(*) AS obs
      FROM events GROUP BY event_type, dow),
    margins AS (
      SELECT c.*, sum(obs) OVER (PARTITION BY event_type) AS row_tot,
             sum(obs) OVER (PARTITION BY dow) AS col_tot,
             sum(obs) OVER () AS n
      FROM cells c),
    terms AS (
      SELECT event_type,
             pow(CAST(obs AS DOUBLE)
                 - CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(n AS DOUBLE), 2)
               / (CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(n AS DOUBLE)) AS t
      FROM margins)
    SELECT event_type, round(1e-9 + sum(t), 6) AS chi2_contrib,
           CAST(6 AS BIGINT) AS dof_per_row
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "Chi-square independence screen (event type × ISO day-of-week "
        "contingency table): per-type contribution to the χ² statistic "
        "against the independence expectation row·col/N. All margins come "
        "from windows over the types×7 cell table — the fact table is "
        "scanned once for the counts; observed/expected stay integer-"
        "derived doubles identical in both engines. Complements dq09's "
        "Benford screen with a two-way categorical test."
    ),
)
def q150_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        "event_type", (F.weekday(F.col("ts").cast("timestamp")) + 1).alias("dow")
    ).agg(F.count("*").alias("obs"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    margins = cells.select(
        "event_type",
        "obs",
        F.sum("obs").over(w_row).alias("row_tot"),
        F.sum("obs").over(w_col).alias("col_tot"),
        F.sum("obs").over(w_all).alias("n"),
    )
    exp = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    t = F.pow(F.col("obs").cast("double") - exp, 2) / exp
    return (
        margins.select("event_type", t.alias("t"))
        .groupBy("event_type")
        .agg(
            F.round(F.lit(1e-9) + F.sum("t"), 6).alias("chi2_contrib"),
            F.lit(6).cast("bigint").alias("dof_per_row"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q151_point_in_time_join",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'signup' OR event_type = 'purchase'),
    hist AS (
      SELECT user_id, event_id AS state_event_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             round(1e-9 + value, 4) AS state_value
      FROM ch),
    clicks AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
    SELECT c.user_id, c.event_id, h.state_event_id, h.state_value
    FROM clicks c JOIN hist h
      ON c.user_id = h.user_id AND c.ts >= h.valid_from
     AND (h.valid_to IS NULL OR c.ts < h.valid_to)
    ORDER BY c.user_id, c.event_id
    """,
    doc=(
        "Point-in-time (feature-store) join: each click event is enriched "
        "with the SCD2 state row valid AT its event time — the "
        "leakage-free feature lookup every training pipeline needs "
        "(joining current state would leak the future). The history comes "
        "from the q78 build (one lead() window); the lookup is a "
        "co-partitioned equi-join on the entity key with the validity "
        "interval as a post-join filter — each event matches at most one "
        "history row, no inequality-join nested loop. One shuffle on "
        "user_id for each side at 100 TB, AQE skew-armed."
    ),
)
def q151_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.operators.merge_ops import scd2_intervals

    ev = load_table(spark, "events", sf_dir)
    hist = scd2_intervals(ev).select(
        F.col("user_id").alias("h_user"),
        F.col("event_id").alias("state_event_id"),
        "valid_from",
        "valid_to",
        "state_value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    return (
        clicks.join(fact_hint(hist, sf_dir), clicks.user_id == hist.h_user)
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("user_id", "event_id", "state_event_id", "state_value")
        .transform(ordered_wide, "user_id", "event_id")
    )


@register(
    "q152_multitouch_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'),
    clicks AS (SELECT user_id, event_id AS c_id, ts AS c_ts
               FROM events WHERE event_type = 'click'),
    touch AS (
      SELECT p.user_id, p.p_id, p.value, c.c_id
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
       AND c.c_ts > p.p_ts - INTERVAL 6 HOUR),
    credit AS (
      SELECT user_id, p_id, c_id,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
             count(*) OVER (PARTITION BY p_id) AS n_touch
      FROM touch)
    SELECT user_id, CAST(count(DISTINCT c_id) AS BIGINT) AS n_touching_clicks,
           round(1e-9 + sum(CAST(vc AS DOUBLE) / (100 * n_touch)), 4) AS attributed_value
    FROM credit GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "Linear multi-touch attribution: each purchase's value splits "
        "equally across the user's clicks in the 6-hour lookback window; "
        "per user, the distinct touching clicks and their total attributed "
        "value. The purchase↔click pairing is a co-partitioned equi-join "
        "on user_id with the lookback as a post-join filter (per-user "
        "event counts bound the fanout), touch counts come from one window "
        "over the touch table. Integer-cents value; identical division "
        "terms on both engines."
    ),
)
def q152_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        cents("value").alias("vc"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
    )
    touch = purchases.join(
        fact_hint(clicks, sf_dir), purchases.p_user == clicks.c_user
    ).filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 6 HOUR"))
    )
    w = Window.partitionBy("p_id")
    credit = touch.select(
        F.col("p_user").alias("user_id"),
        "p_id",
        "c_id",
        "vc",
        F.count("*").over(w).alias("n_touch"),
    )
    return (
        credit.groupBy("user_id")
        .agg(
            F.count_distinct("c_id").cast("bigint").alias("n_touching_clicks"),
            F.round(
                F.lit(1e-9)
                + F.sum(F.col("vc").cast("double") / (100 * F.col("n_touch"))),
                4,
            ).alias("attributed_value"),
        )
        .transform(present_sorted, "user_id")
    )


_GRID_R = 0.02  # radius; also the grid cell width


@register(
    "q153_grid_spatial_join",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
      FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
      FROM pts a JOIN pts b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, round(1e-9 + sqrt(d2), 6) AS dist
    FROM pairs WHERE d2 <= {_GRID_R * _GRID_R}
    ORDER BY id_a, id_b
    """,
    doc=(
        "2-D radius join via uniform grid bucketing (points: the first two "
        "embedding dims): each left point explodes to its 3×3 cell "
        "neighborhood at cell width = radius, the join is a co-partitioned "
        "equi-join on the cell, and the exact squared-distance filter runs "
        "after — every qualifying pair's cells differ by ≤1 per axis "
        "(floor(u)−floor(v) ≤ 1 whenever u−v ≤ 1), and each pair collides "
        "in exactly one exploded cell, so no dedup. The oracle is the "
        "naive quadratic join; at 100 TB the grid shape replaces a "
        "nested-loop spatial join with one shuffle, the 2-D twin of "
        "q140's time-band bucketing."
    ),
)
def q153_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cx = F.floor(F.col("x") / _GRID_R).cast("bigint")
    cy = F.floor(F.col("y") / _GRID_R).cast("bigint")
    left = pts.select(
        F.col("vec_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cx - 1, cx + 1),
                    lambda i: F.transform(
                        F.sequence(cy - 1, cy + 1),
                        lambda j: F.struct(i.alias("cx"), j.alias("cy")),
                    ),
                )
            )
        ).alias("cell"),
    ).select("id_a", "xa", "ya", "cell.cx", "cell.cy")
    right = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("d2"))
        .filter(F.col("d2") <= _GRID_R * _GRID_R)
        .select(
            "id_a", "id_b", F.round(F.lit(1e-9) + F.sqrt("d2"), 6).alias("dist")
        )
        .transform(present_sorted, "id_a", "id_b")
    )


@register(
    "q154_nulls_ordering",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
           CAST(row_number() OVER (ORDER BY nullif(o_orderstatus, 'O') NULLS FIRST,
                                   o_orderkey) AS BIGINT) AS rn_nulls_first
    FROM orders
    ORDER BY st NULLS LAST, o_orderkey
    LIMIT 200
    """,
    doc=(
        "Explicit NULLS FIRST / NULLS LAST ordering parity: the same "
        "nullable key is ranked nulls-first and presented nulls-last, "
        "pinning that both engines agree on both placements (Spark "
        "defaults nulls-first for ASC, DuckDB nulls-last — the explicit "
        "modifiers are the only portable spelling). Deterministic via the "
        "orderkey tiebreak; top-k keeps the output bounded."
    ),
)
def q154_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    w = Window.orderBy(st.asc_nulls_first(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_orderkey",
            st.alias("st"),
            F.row_number().over(w).cast("bigint").alias("rn_nulls_first"),
        )
        .orderBy(F.col("st").asc_nulls_last(), F.col("o_orderkey"))
        .limit(200)
    )


@register(
    "q155_month_arithmetic_edges",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
                  WHERE day(o_orderdate) >= 28)
    SELECT d,
           CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_1m,
           CAST(d + INTERVAL 13 MONTH AS DATE) AS plus_13m,
           CAST(d - INTERVAL 1 MONTH AS DATE) AS minus_1m,
           CAST(last_day(d) AS DATE) AS eom,
           (d = last_day(d)) AS is_eom
    FROM days ORDER BY d
    """,
    doc=(
        "Calendar-month arithmetic on the clamp-sensitive edge days "
        "(day ≥ 28): ±1 and +13 months (leap-year + year-cross), last_day, "
        "end-of-month detection. Pins that Spark's add_months and DuckDB's "
        "INTERVAL MONTH share the exact same semantics — clamp to the "
        "target month's last day, NO end-of-month stickiness (Jan 31 + 1 "
        "month = Feb 29, but Feb 29 + 1 month = Mar 29) — verified on the "
        "full edge matrix before this query was declared."
    ),
)
def q155_month_arithmetic_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    days = (
        orders.select(F.col("o_orderdate").cast("date").alias("d"))
        .filter(F.dayofmonth("d") >= 28)
        .distinct()
    )
    return (
        days.select(
            "d",
            F.add_months("d", 1).alias("plus_1m"),
            F.add_months("d", 13).alias("plus_13m"),
            F.add_months("d", -1).alias("minus_1m"),
            F.last_day("d").alias("eom"),
            (F.col("d") == F.last_day("d")).alias("is_eom"),
        )
        .transform(present_sorted, "d")
    )


@register(
    "q156_compaction_maintenance",
    oracle="""
    SELECT event_type, count(*) AS rows_out,
           CAST(sum(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT)
                AS BIGINT) AS content_checksum,
           CAST(1 AS BIGINT) AS files_after
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    category="sources",
    doc=(
        "Small-files compaction (lakehouse table maintenance): the events "
        "table is first written hive-partitioned by event_type from 8 "
        "hash-spread tasks (8 small files per partition — the classic "
        "streaming-ingest debris), then compacted by repartitioning on the "
        "partition column so each partition is rewritten by exactly one "
        "task (1 file). The query returns the post-compaction state: row "
        "counts, an engine-neutral md5-based content checksum, and the "
        "observed file count per partition — the oracle recomputes "
        "rows/checksum from the source table and pins files_after = 1, so "
        "the compaction is proven lossless, not assumed."
    ),
)
def q156_compaction_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type")
    raw_dir = tempfile.mkdtemp(prefix="hds_q156_raw_")
    ev.repartition(8, F.col("event_id")).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(raw_dir)
    compact_dir = tempfile.mkdtemp(prefix="hds_q156_compact_")
    (
        spark.read.parquet(raw_dir)
        .repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(compact_dir)
    )
    # input_file_name() is non-deterministic to Catalyst: project it into a
    # plain column BEFORE aggregating
    back = spark.read.parquet(compact_dir).select(
        "event_id", "event_type", F.input_file_name().alias("fname")
    )
    checksum = F.sum(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("rows_out"),
            checksum.cast("bigint").alias("content_checksum"),
            F.count_distinct("fname").cast("bigint").alias("files_after"),
        )
        .transform(present_sorted, "event_type")
    )


@register(
    "q157_resettable_running_total",
    oracle="""
    WITH seg AS (
      SELECT user_id, event_id, ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS epoch
      FROM events)
    SELECT user_id, event_id,
           round(1e-9 + CAST(sum(vc) OVER (PARTITION BY user_id, epoch
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100, 2)
             AS running_since_signup
    FROM seg ORDER BY user_id, event_id
    """,
    doc=(
        "Running total that RESETS at each marker event (value accumulated "
        "per user since their last signup) — the conditional-accumulator "
        "pattern SQL has no native operator for: a running count of the "
        "marker rows numbers the epochs, then the cumulative sum runs "
        "inside the (user, epoch) partition. Two windows over one user "
        "shuffle; integer-cents exact."
    ),
)
def q157_resettable_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w_epoch = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = ev.select(
        "user_id",
        "event_id",
        "ts",
        cents("value").alias("vc"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w_epoch)
        .alias("epoch"),
    )
    w_run = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        seg.select(
            "user_id",
            "event_id",
            F.round(
                F.lit(1e-9) + F.sum("vc").over(w_run).cast("double") / 100, 2
            ).alias("running_since_signup"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q159_funnel_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    sess AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM s),
    lat AS (
      SELECT user_id, sid, event_id, us, event_type,
             min(CASE WHEN event_type = 'click' THEN us END)
               OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click_us
      FROM sess)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(min(us - first_click_us) AS BIGINT) AS min_latency_us,
           CAST(max(us - first_click_us) AS BIGINT) AS max_latency_us
    FROM lat WHERE event_type = 'purchase' AND first_click_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "Conversion latency inside 30-minute sessions: per purchase, the "
        "microsecond gap since the session's first preceding click "
        "(running conditional MIN inside the gap-sessionized partition), "
        "aggregated per user. Composes the q59 sessionization with the "
        "funnel-timing question product analytics actually asks; three "
        "windows over one user-keyed shuffle, exact integer µs throughout."
    ),
)
def q159_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")
    # gap test in exact µs (a seconds-truncating cast could disagree with
    # the oracle's INTERVAL comparison on sub-second boundaries)
    us = F.unix_micros(ts)
    brk = F.when(us - F.lag(us).over(w_ord) > 1800 * 1_000_000, 1).otherwise(0)
    s = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        us.alias("us"),
        brk.alias("brk"),
    )
    sess = s.withColumn(
        "sid", F.sum("brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    w_sess = (
        Window.partitionBy("user_id", "sid")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lat = sess.withColumn(
        "first_click_us",
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).over(w_sess),
    )
    return (
        lat.filter(
            (F.col("event_type") == "purchase") & F.col("first_click_us").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_conversions"),
            F.min(F.col("us") - F.col("first_click_us"))
            .cast("bigint")
            .alias("min_latency_us"),
            F.max(F.col("us") - F.col("first_click_us"))
            .cast("bigint")
            .alias("max_latency_us"),
        )
        .transform(present_sorted, "user_id")
    )


@register(
    "q160_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT c_custkey,
             coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)), 0) AS sc
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey),
    ranked AS (SELECT *, ntile(10) OVER (ORDER BY sc DESC, c_custkey) AS decile
               FROM spend),
    agg AS (SELECT decile, count(*) AS n, sum(sc) AS s FROM ranked GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n_customers,
           round(1e-9 + CAST(s AS DOUBLE)/100, 2) AS decile_spend,
           round(1e-9 + CAST(sum(s) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(sum(s) OVER () AS DOUBLE), 6) AS cum_share
    FROM agg ORDER BY decile
    """,
    doc=(
        "Decile lift / gains table: customers ranked by lifetime spend "
        "(orderless customers included at 0 via the outer join), split "
        "into spend-ordered deciles, each reporting its spend and the "
        "cumulative share — the classic marketing-analytics lift chart. "
        "The global ntile runs over customer-cardinality aggregated rows "
        "with a deterministic (spend, custkey) order; cumulative windows "
        "run over 10 decile rows. Integer-cents exact through both "
        "divisions."
    ),
)
def q160_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # orders is fact-scale: co-partitioned join (never a static broadcast —
    # the registry-wide audit enforces this for every query)
    spend = (
        cust.join(fact_hint(orders, sf_dir), cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias("sc"))
    )
    ranked = spend.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("sc"), F.asc("c_custkey")))
    )
    agg = ranked.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("sc").alias("s")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return (
        agg.select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(F.lit(1e-9) + F.col("s").cast("double") / 100, 2).alias(
                "decile_spend"
            ),
            F.round(
                F.lit(1e-9)
                + F.sum("s").over(w_cum).cast("double")
                / F.sum("s").over(w_all).cast("double"),
                6,
            ).alias("cum_share"),
        )
        .transform(present_sorted, "decile")
    )


@register(
    "q163_scalar_conformance",
    oracle="""
    SELECT o_orderkey,
           round(1e-9 + sin(o_totalprice / 100000), 6) AS f_sin,
           round(1e-9 + cos(o_totalprice / 100000), 6) AS f_cos,
           round(1e-9 + atan2(o_totalprice, o_orderkey + 1), 6) AS f_atan2,
           round(1e-9 + ln(o_totalprice), 6) AS f_ln,
           round(1e-9 + log10(o_totalprice), 6) AS f_log10,
           round(1e-9 + exp(o_totalprice / 1000000), 6) AS f_exp,
           round(1e-9 + sqrt(o_totalprice), 6) AS f_sqrt,
           round(1e-9 + cbrt(o_totalprice), 6) AS f_cbrt,
           CAST(abs(o_orderkey - 500) AS BIGINT) AS f_abs,
           CAST(sign(o_orderkey - 500) AS BIGINT) AS f_sign,
           CAST(o_orderkey % 97 AS BIGINT) AS f_mod,
           CAST(xor(o_orderkey, 255) AS BIGINT) AS f_xor,
           CAST(o_orderkey & 4095 AS BIGINT) AS f_and,
           CAST(o_orderkey | 16 AS BIGINT) AS f_or,
           ascii(o_orderstatus) AS f_ascii,
           chr(65 + CAST(o_orderkey % 26 AS INTEGER)) AS f_chr,
           repeat(o_orderstatus, 3) AS f_repeat,
           reverse(o_orderpriority) AS f_reverse,
           lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS f_lpad,
           translate(o_orderpriority, '-', '_') AS f_translate,
           CAST(levenshtein(o_orderpriority, '1-URGENT') AS BIGINT) AS f_lev,
           md5(CAST(o_orderkey AS VARCHAR)) AS f_md5,
           CAST(greatest(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS BIGINT)
             AS f_greatest,
           CAST(least(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS BIGINT)
             AS f_least,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS f_floor,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS f_ceil
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
    doc=(
        "Scalar-function conformance suite: 26 built-ins — trig/log/exp "
        "roots, integer abs/sign/mod, bitwise xor/and/or, string "
        "ascii/chr/repeat/reverse/lpad/translate/levenshtein/md5, "
        "greatest/least, floor/ceil — evaluated over the same rows on "
        "both engines in one projection. Transcendentals follow the "
        "rounding convention; everything else is exact. The wide-but-"
        "cheap shape keeps the suite a pure codegen pass over a pruned "
        "100-key scan."
    ),
)
def q163_scalar_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 100)
    k = F.col("o_orderkey")
    tp = F.col("o_totalprice")
    r6 = lambda c: F.round(F.lit(1e-9) + c, 6)
    return (
        orders.select(
            "o_orderkey",
            r6(F.sin(tp / 100000)).alias("f_sin"),
            r6(F.cos(tp / 100000)).alias("f_cos"),
            r6(F.atan2(tp, k + 1)).alias("f_atan2"),
            r6(F.log(tp)).alias("f_ln"),
            r6(F.log10(tp)).alias("f_log10"),
            r6(F.exp(tp / 1000000)).alias("f_exp"),
            r6(F.sqrt(tp)).alias("f_sqrt"),
            r6(F.cbrt(tp)).alias("f_cbrt"),
            F.abs(k - 500).cast("bigint").alias("f_abs"),
            F.signum(k - 500).cast("bigint").alias("f_sign"),
            (k % 97).cast("bigint").alias("f_mod"),
            F.expr("o_orderkey ^ 255").cast("bigint").alias("f_xor"),
            F.expr("o_orderkey & 4095").cast("bigint").alias("f_and"),
            F.expr("o_orderkey | 16").cast("bigint").alias("f_or"),
            F.ascii("o_orderstatus").alias("f_ascii"),
            F.expr("char(65 + CAST(o_orderkey % 26 AS INT))").alias("f_chr"),
            F.repeat("o_orderstatus", 3).alias("f_repeat"),
            F.reverse("o_orderpriority").alias("f_reverse"),
            F.lpad(k.cast("string"), 8, "0").alias("f_lpad"),
            F.translate("o_orderpriority", "-", "_").alias("f_translate"),
            F.levenshtein("o_orderpriority", F.lit("1-URGENT"))
            .cast("bigint")
            .alias("f_lev"),
            F.md5(k.cast("string")).alias("f_md5"),
            F.greatest(k % 7, k % 5, k % 3).cast("bigint").alias("f_greatest"),
            F.least(k % 7, k % 5, k % 3).cast("bigint").alias("f_least"),
            F.floor(tp / 1000).cast("bigint").alias("f_floor"),
            F.ceil(tp / 1000).cast("bigint").alias("f_ceil"),
        )
        .transform(ordered_wide, "o_orderkey")
    )


@register(
    "dq13_catalog_key_audit",
    oracle="""
    SELECT 'customer' AS tbl, count(*) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct_pk,
           (count(*) = count(DISTINCT c_custkey)) AS pk_unique,
           CAST(count(*) - count(c_custkey) AS BIGINT) AS n_null_pk
    FROM customer
    UNION ALL
    SELECT 'lineitem', count(*),
           CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           (count(*) = count(DISTINCT (l_orderkey, l_linenumber))),
           CAST(count(*) - count(l_orderkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'nation', count(*), CAST(count(DISTINCT n_nationkey) AS BIGINT),
           (count(*) = count(DISTINCT n_nationkey)),
           CAST(count(*) - count(n_nationkey) AS BIGINT)
    FROM nation
    UNION ALL
    SELECT 'orders', count(*), CAST(count(DISTINCT o_orderkey) AS BIGINT),
           (count(*) = count(DISTINCT o_orderkey)),
           CAST(count(*) - count(o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'part', count(*), CAST(count(DISTINCT p_partkey) AS BIGINT),
           (count(*) = count(DISTINCT p_partkey)),
           CAST(count(*) - count(p_partkey) AS BIGINT)
    FROM part
    UNION ALL
    SELECT 'region', count(*), CAST(count(DISTINCT r_regionkey) AS BIGINT),
           (count(*) = count(DISTINCT r_regionkey)),
           CAST(count(*) - count(r_regionkey) AS BIGINT)
    FROM region
    UNION ALL
    SELECT 'supplier', count(*), CAST(count(DISTINCT s_suppkey) AS BIGINT),
           (count(*) = count(DISTINCT s_suppkey)),
           CAST(count(*) - count(s_suppkey) AS BIGINT)
    FROM supplier
    ORDER BY tbl
    """,
    category="quality",
    doc=(
        "Catalog-wide primary-key audit in one query: every relational "
        "table's row count, distinct-PK count (the lineitem PK is the "
        "composite (orderkey, linenumber)), uniqueness verdict, and "
        "null-key count — the constraint check a warehouse without "
        "enforced constraints must run itself. Each branch is one "
        "aggregate over its own scan; the union is planning-time glue, "
        "so the audit parallelizes per table."
    ),
)
def dq13_catalog_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(tbl: str, pk_cols: list[str]):
        df = load_table(spark, tbl, sf_dir)
        pk = F.struct(*pk_cols) if len(pk_cols) > 1 else F.col(pk_cols[0])
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").alias("n_rows"),
            F.count_distinct(pk).cast("bigint").alias("n_distinct_pk"),
            (F.count("*") == F.count_distinct(pk)).alias("pk_unique"),
            (F.count("*") - F.count(pk_cols[0])).cast("bigint").alias("n_null_pk"),
        )
    parts = [
        audit("customer", ["c_custkey"]),
        audit("lineitem", ["l_orderkey", "l_linenumber"]),
        audit("nation", ["n_nationkey"]),
        audit("orders", ["o_orderkey"]),
        audit("part", ["p_partkey"]),
        audit("region", ["r_regionkey"]),
        audit("supplier", ["s_suppkey"]),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.transform(present_sorted, "tbl")


@register(
    "q165_moving_median",
    oracle="""
    SELECT user_id, event_id,
           round(1e-9 + median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_median
    FROM events ORDER BY user_id, event_id
    """,
    doc=(
        "Moving median over a trailing 5-row frame, proven against "
        "DuckDB's NATIVE windowed median: Spark has no median window "
        "function, so the frame's value list is collected, sorted, and "
        "indexed — odd frames take the middle element exactly, even "
        "frames (the partition's first rows) average the two middles, "
        "matching DuckDB's interpolation on identical doubles. Bounded "
        "frame ⇒ bounded per-row state; one user-keyed shuffle."
    ),
)
def q165_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    frame = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    )
    vals = F.array_sort(F.collect_list("value").over(frame))
    n = F.size(vals)
    odd = F.element_at(vals, ((n + 1) / F.lit(2)).cast("int"))
    even = (
        F.element_at(vals, (n / F.lit(2)).cast("int"))
        + F.element_at(vals, (n / F.lit(2)).cast("int") + 1)
    ) / 2
    med = F.when(n % 2 == 1, odd).otherwise(even)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.lit(1e-9) + med, 4).alias("mov_median"),
        )
        .orderBy("user_id", "event_id")
        .drop("ts")
    )


@register(
    "dq14_seasonal_adjusted_anomalies",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, isodow(ts) AS dow,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
      FROM events),
    win AS (
      SELECT event_type, event_id, vc,
             sum(vc) OVER (PARTITION BY event_type, dow) AS sum_dow,
             count(*) OVER (PARTITION BY event_type, dow) AS n_dow,
             sum(vc) OVER (PARTITION BY event_type) AS sum_all,
             count(*) OVER (PARTITION BY event_type) AS n_all
      FROM base),
    adj AS (
      SELECT event_type, event_id,
             CAST(vc AS DOUBLE)
             / ((CAST(sum_dow AS DOUBLE) / n_dow) / (CAST(sum_all AS DOUBLE) / n_all))
               AS av
      FROM win),
    stats AS (
      SELECT event_type, event_id, av,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(av) OVER (PARTITION BY event_type) AS s,
             sum(av*av) OVER (PARTITION BY event_type) AS s2
      FROM adj)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_anomalies
    FROM stats
    WHERE abs(av - s/n) > 3 * sqrt(greatest(s2/n - (s/n)*(s/n), 0))
    GROUP BY event_type ORDER BY event_type
    """,
    category="quality",
    doc=(
        "Seasonally-adjusted anomaly detection: each value is deflated by "
        "its (type, ISO-dow) seasonal index before the 3σ screen, so a "
        "normal Saturday spike is not an anomaly and a quiet-day outlier "
        "is — the composition of q147's index with dq01's z-score that "
        "plain control charts get wrong on seasonal data. The index is "
        "exact (integer window sums make it the same double on both "
        "engines); the fact table is scanned once with all margins as "
        "windows."
    ),
)
def dq14_seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id",
        "event_type",
        (F.weekday(F.col("ts").cast("timestamp")) + 1).alias("dow"),
        cents("value").alias("vc"),
    )
    w_td = Window.partitionBy("event_type", "dow")
    w_t = Window.partitionBy("event_type")
    win = base.select(
        "event_type",
        "event_id",
        "vc",
        F.sum("vc").over(w_td).alias("sum_dow"),
        F.count("*").over(w_td).alias("n_dow"),
        F.sum("vc").over(w_t).alias("sum_all"),
        F.count("*").over(w_t).alias("n_all"),
    )
    av = F.col("vc").cast("double") / (
        (F.col("sum_dow").cast("double") / F.col("n_dow"))
        / (F.col("sum_all").cast("double") / F.col("n_all"))
    )
    adj = win.select("event_type", "event_id", av.alias("av"))
    stats = adj.select(
        "event_type",
        "av",
        F.count("*").over(w_t).alias("n"),
        F.sum("av").over(w_t).alias("s"),
        F.sum(F.col("av") * F.col("av")).over(w_t).alias("s2"),
    )
    mean = F.col("s") / F.col("n")
    sigma = F.sqrt(
        F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    )
    return (
        stats.filter(F.abs(F.col("av") - mean) > 3 * sigma)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_anomalies"))
        .transform(present_sorted, "event_type")
    )


@register(
    "q167_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL
              GROUP BY cur, nxt)
    SELECT cur, nxt, CAST(n AS BIGINT) AS n,
           round(1e-9 + CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
    FROM trans ORDER BY cur, nxt
    """,
    doc=(
        "First-order Markov transition matrix of user event sequences: "
        "lead() pairs each event with its successor inside the user "
        "timeline, transitions aggregate to types×types counts, and row "
        "normalization runs as a window over that tiny matrix — the "
        "behavioral model behind next-action prediction and funnel "
        "drop-off analysis. One user shuffle; integer counts through the "
        "rounded probability."
    ),
)
def q167_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    w_row = Window.partitionBy("cur")
    return (
        trans.select(
            "cur",
            "nxt",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.lit(1e-9)
                + F.col("n").cast("double") / F.sum("n").over(w_row).cast("double"),
                6,
            ).alias("p"),
        )
        .transform(present_sorted, "cur", "nxt")
    )


@register(
    "q168_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT c_custkey,
             max(o_orderdate) AS last_order,
             count(o_orderkey) AS freq,
             coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)), 0) AS monet
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey),
    active AS (SELECT * FROM rfm WHERE freq > 0),
    scored AS (
      SELECT c_custkey,
             ntile(5) OVER (ORDER BY last_order DESC, c_custkey) AS r_score,
             ntile(5) OVER (ORDER BY freq DESC, c_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monet DESC, c_custkey) AS m_score
      FROM active)
    SELECT r_score, f_score, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(m_score) AS BIGINT) AS best_m, CAST(max(m_score) AS BIGINT) AS worst_m
    FROM scored GROUP BY r_score, f_score ORDER BY r_score, f_score
    """,
    doc=(
        "RFM segmentation (recency / frequency / monetary quintiles): "
        "per-customer aggregates from one co-partitioned orders join, "
        "three ntile(5) rankings with custkey tiebreaks, reported as the "
        "R×F segment grid with the monetary-score spread — the classic "
        "CRM segmentation. The quintile windows run over the "
        "customer-cardinality aggregate, never the fact table."
    ),
)
def q168_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    rfm = (
        cust.join(fact_hint(orders, sf_dir), cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("o_orderkey").alias("freq"),
            F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias("monet"),
        )
        .filter(F.col("freq") > 0)
    )
    r = F.ntile(5).over(Window.orderBy(F.desc("last_order"), F.asc("c_custkey")))
    f = F.ntile(5).over(Window.orderBy(F.desc("freq"), F.asc("c_custkey")))
    m = F.ntile(5).over(Window.orderBy(F.desc("monet"), F.asc("c_custkey")))
    scored = rfm.select(
        "c_custkey", r.alias("r_score"), f.alias("f_score"), m.alias("m_score")
    )
    return (
        scored.groupBy("r_score", "f_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("m_score").cast("bigint").alias("best_m"),
            F.max("m_score").cast("bigint").alias("worst_m"),
        )
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            "n_customers",
            "best_m",
            "worst_m",
        )
        .transform(present_sorted, "r_score", "f_score")
    )


@register(
    "q169_hierarchical_share",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name,
             sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS rc
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT r_name, n_name,
           round(1e-9 + CAST(rc AS DOUBLE)/100, 2) AS revenue,
           round(1e-9 + CAST(rc AS DOUBLE)
                 / CAST(sum(rc) OVER (PARTITION BY r_name) AS DOUBLE), 6)
             AS share_of_region,
           round(1e-9 + CAST(rc AS DOUBLE) / CAST(sum(rc) OVER () AS DOUBLE), 6)
             AS share_of_total
    FROM rev ORDER BY r_name, n_name
    """,
    doc=(
        "Hierarchical share-of-parent report: nation revenue as a share of "
        "its region AND of the grand total — the two-level ratio-to-report "
        "every drill-down dashboard needs (q27 covers one level). One "
        "fact aggregation on the dim keys; both share windows run over "
        "the region×nation aggregate; exact integer cents make both "
        "engines agree through the divisions."
    ),
)
def q169_hierarchical_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents("l_extendedprice")).alias("rc"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return (
        rev.select(
            "r_name",
            "n_name",
            F.round(F.lit(1e-9) + F.col("rc").cast("double") / 100, 2).alias("revenue"),
            F.round(
                F.lit(1e-9)
                + F.col("rc").cast("double") / F.sum("rc").over(w_region).cast("double"),
                6,
            ).alias("share_of_region"),
            F.round(
                F.lit(1e-9)
                + F.col("rc").cast("double") / F.sum("rc").over(w_all).cast("double"),
                6,
            ).alias("share_of_total"),
        )
        .transform(present_sorted, "r_name", "n_name")
    )


@register(
    "q170_compounding_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS rc
      FROM orders GROUP BY month),
    factors AS (
      SELECT month,
             CAST(rc AS DOUBLE) / CAST(lag(rc) OVER (ORDER BY month) AS DOUBLE) AS f
      FROM monthly)
    SELECT month,
           round(1e-9 + 100 * exp(sum(ln(f)) OVER (ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4)
             AS index_base100
    FROM factors WHERE f IS NOT NULL
    ORDER BY month
    """,
    doc=(
        "Compounding growth index (base 100): monthly revenue ratios "
        "chained into a cumulative product via the exp-of-summed-logs "
        "rewrite — SQL's missing PRODUCT() aggregate, expressible because "
        "revenue factors are strictly positive. Exact integer-cents "
        "revenues make the ratios identical doubles; all windows run over "
        "the months-cardinality aggregate."
    ),
)
def q170_compounding_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(cents("o_totalprice")).alias("rc"))
    w = Window.orderBy("month")
    factors = monthly.select(
        "month",
        (
            F.col("rc").cast("double") / F.lag("rc").over(w).cast("double")
        ).alias("f"),
    ).filter(F.col("f").isNotNull())
    w_cum = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        factors.select(
            "month",
            F.round(
                F.lit(1e-9) + 100 * F.exp(F.sum(F.log("f")).over(w_cum)), 4
            ).alias("index_base100"),
        )
        .transform(present_sorted, "month")
    )


@register(
    "q171_revenue_concentration",
    oracle="""
    WITH ranked AS (
      SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS pc,
             cume_dist() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS cd
      FROM orders)
    SELECT CAST(count(*) FILTER (WHERE cd <= 0.01) AS BIGINT) AS n_top1pct,
           round(1e-9 + CAST(sum(pc) FILTER (WHERE cd <= 0.01) AS DOUBLE)
                 / CAST(sum(pc) AS DOUBLE), 6) AS top1pct_share,
           round(1e-9 + CAST(sum(pc) FILTER (WHERE cd <= 0.10) AS DOUBLE)
                 / CAST(sum(pc) AS DOUBLE), 6) AS top10pct_share
    FROM ranked
    """,
    doc=(
        "Revenue concentration (whale analysis): the share of total order "
        "value carried by the top 1% and top 10% of orders, via "
        "cume_dist() with a deterministic orderkey tiebreak and FILTER-"
        "clause conditional sums — the Pareto question behind capacity "
        "planning and fraud thresholds. cume_dist is exact rational "
        "(rank/count) so the percentile cuts are engine-identical; sums "
        "are exact integer cents. Spark side never windows the raw fact: "
        "with the orderkey tiebreak every rank is distinct, so cd = rn/N "
        "and the cut counts m(q) = max{rn : double(rn/N) <= q} depend only "
        "on N — computed driver-side with IEEE-identical Python floats — "
        "while the top-m cent sums come from cumulative counts over the "
        "per-distinct-price aggregate (rows tied on price carry identical "
        "pc, so the partial group contributes (m - cum_before) * pc "
        "exactly). The window runs over the price-cardinality table, "
        "matching the q138/q160 windows-over-bounded-aggregates "
        "discipline instead of a single-partition sort of the fact."
    ),
)
def q171_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    n_total = orders.count()

    def m_cut(q: float) -> int:
        # max rank whose IEEE-double cume_dist rn/N is <= q (exactly the
        # set of rows DuckDB's cd <= q keeps, since ranks are distinct)
        m = int(q * n_total)
        while m + 1 <= n_total and (m + 1) / n_total <= q:
            m += 1
        while m >= 1 and m / n_total > q:
            m -= 1
        return m

    m1, m10 = m_cut(0.01), m_cut(0.10)
    per = orders.groupBy("o_totalprice").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(cents("o_totalprice")).alias("spc")
    )
    w = Window.orderBy(F.desc("o_totalprice")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "cnt",
        "spc",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
    )
    take = lambda m: F.greatest(
        F.lit(0), F.least(F.col("cnt"), F.lit(m) - F.col("cum_before"))
    )
    # all rows in a price group share pc, so per-row pc = spc/cnt exactly
    pc_one = (F.col("spc") / F.col("cnt")).cast("bigint")
    return cum.agg(
        F.lit(m1).cast("bigint").alias("n_top1pct"),
        F.round(
            F.lit(1e-9)
            + F.sum(take(m1) * pc_one).cast("double")
            / F.sum("spc").cast("double"),
            6,
        ).alias("top1pct_share"),
        F.round(
            F.lit(1e-9)
            + F.sum(take(m10) * pc_one).cast("double")
            / F.sum("spc").cast("double"),
            6,
        ).alias("top10pct_share"),
    )
