"""Source/sink operator entries: each writes testdata out in a format /
layout, reads it back, and aggregates — the oracle runs the same aggregate
on the original table, so a hash match proves the round-trip is lossless."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table, local_rows_df
from highs_duckdb_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    write_partitioned_parquet,
)


def _tmpdir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"hds_{tag}_")


@register(
    "q70_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           round(1e-9 + CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    category="sources",
    doc="CSV sink + source round-trip (explicit schema — no inference pass) preserves values exactly.",
)
def q70_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    path = _tmpdir("csv")
    cust.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, cust.schema)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"), 2
            ).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q71_partitioned_prune",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
    FROM orders WHERE year(o_orderdate) = 1997
    """,
    category="sources",
    doc=(
        "Hive-style partitioned parquet write (partitionBy year) + pruned "
        "read: the yr=1997 filter eliminates sibling partitions at planning "
        "time — at 100 TB this is the difference between scanning one "
        "directory and the whole table."
    ),
)
def q71_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "yr", F.year("o_orderdate").cast("int")
    )
    path = _tmpdir("part")
    write_partitioned_parquet(orders, path, ["yr"])
    back = spark.read.parquet(path)
    return back.filter(F.col("yr") == 1997).agg(
        F.count("*").alias("n"),
        F.round(
            F.lit(1e-9) + F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2
        ).alias("total"),
    )


@register(
    "q72_json_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    category="sources",
    doc="JSON lines sink + source round-trip with explicit schema.",
)
def q72_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    path = _tmpdir("json")
    docs.write.mode("overwrite").json(path)
    back = read_json(spark, path, docs.schema)
    return (
        back.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("lang")
    )


@register(
    "q73_orc_roundtrip",
    oracle="""
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n,
           round(1e-9 + CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_bal
    FROM supplier GROUP BY nationkey ORDER BY nationkey
    """,
    category="sources",
    doc="ORC sink + source round-trip (the second columnar format Spark ships).",
)
def q73_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, "supplier", sf_dir)
    path = _tmpdir("orc")
    sup.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    return (
        back.groupBy(F.col("s_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("s_acctbal").cast("decimal(12,2)")).cast("double"), 2
            ).alias("total_bal"),
        )
        .orderBy("nationkey")
    )


@register(
    "q74_ctas_catalog",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    category="sources",
    doc=(
        "CTAS + DROP TABLE parity (reference: example_usage.sql:19-22,88-93): "
        "create a table from a query, read it back, drop it."
    ),
)
def q74_ctas_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("q74_orders_src")
    spark.sql("DROP TABLE IF EXISTS q74_big_orders")
    warehouse_tmp = _tmpdir("warehouse_q74")  # fresh location: external-table DROP keeps files
    spark.sql(
        f"CREATE TABLE q74_big_orders USING parquet LOCATION '{warehouse_tmp}' "
        "AS SELECT * FROM q74_orders_src WHERE o_totalprice > 150000"
    )
    out = (
        spark.table("q74_big_orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus")
    )
    result = local_rows_df(spark, out.collect(), out.schema)  # materialize before drop
    spark.sql("DROP TABLE q74_big_orders")
    return result


@register(
    "q76_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n,
           round(1e-9 + CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity > 40
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    category="sources",
    doc=(
        "Bucketed co-located join: both fact tables written bucketBy(8, "
        "orderkey) so the join needs NO shuffle exchange (asserted in "
        "test_plans) — at 100 TB pre-bucketing the two largest tables on "
        "their join key removes the dominant shuffle entirely."
    ),
)
def q76_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    loc = _tmpdir("buckets")
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        orders.write.mode("overwrite")
        .option("path", os.path.join(loc, "orders"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", os.path.join(loc, "lineitem"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    out = (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .filter(F.col("l_quantity") > 40)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.lit(1e-9) + F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double"),
                2,
            ).alias("total"),
        )
        .orderBy("o_orderpriority")
    )
    result = local_rows_df(spark, out.collect(), out.schema)  # materialize before drop
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return result


@register(
    "q75_text_roundtrip",
    oracle="""
    SELECT split_part(p_name, ' ', 1) AS first_word,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(p_partkey) AS BIGINT) AS key_sum
    FROM part GROUP BY first_word ORDER BY first_word
    """,
    category="sources",
    doc=(
        "Line-oriented text sink + source round-trip (write.text/read.text "
        "— the log-file / raw-corpus format): rows serialized to "
        "'key|name' lines, parsed back with split_part, aggregated. Hash "
        "match against the original table proves the round-trip lossless."
    ),
)
def q75_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    path = _tmpdir("text")
    part.select(
        F.concat_ws("|", F.col("p_partkey").cast("string"), F.col("p_name")).alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parsed = back.select(
        F.split_part(F.col("value"), F.lit("|"), F.lit(1)).cast("bigint").alias("p_partkey"),
        F.split_part(F.col("value"), F.lit("|"), F.lit(2)).alias("p_name"),
    )
    return (
        parsed.groupBy(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"))
        .agg(
            F.count("*").alias("n"),
            F.sum("p_partkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("first_word")
    )


@register(
    "q68_xml_roundtrip",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_nation
    FROM nation GROUP BY regionkey ORDER BY regionkey
    """,
    category="sources",
    doc=(
        "XML sink + source round-trip (Spark 4 ships spark-xml as a "
        "built-in format): nation serialized as <row> elements, read back "
        "with an explicit rowTag, aggregated. Completes the format matrix "
        "alongside parquet/CSV/JSON/ORC/line-text. Schema inference on "
        "read is exercised deliberately — XML feeds rarely carry schemas."
    ),
)
def q68_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    path = _tmpdir("xml")
    nation.write.mode("overwrite").format("xml").option("rootTag", "nations").option(
        "rowTag", "row"
    ).save(path)
    back = spark.read.format("xml").option("rowTag", "row").load(path)
    return (
        back.groupBy(F.col("n_regionkey").cast("bigint").alias("regionkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("regionkey")
    )


@register(
    "q67_schema_evolution",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name,
           CAST(NULL AS VARCHAR) AS batch_tag
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT CAST(n_nationkey AS BIGINT), n_name, 'v2'
    FROM nation WHERE n_regionkey = 1
    ORDER BY nationkey
    """,
    category="sources",
    doc=(
        "Schema evolution on read: two parquet batches written with "
        "different schemas (v2 adds a batch_tag column), unified by "
        "mergeSchema — the landing-zone reality where producers add fields "
        "over time. Old rows surface the new column as NULL; at 100 TB "
        "this is footer-schema union only, no data rewrite."
    ),
)
def q67_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    path = _tmpdir("evolve")
    v1 = nation.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"), "n_name"
    )
    v2 = nation.filter(F.col("n_regionkey") == 1).select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        "n_name",
        F.lit("v2").alias("batch_tag"),
    )
    v1.write.mode("overwrite").parquet(path + "/b=1")
    v2.write.mode("overwrite").parquet(path + "/b=2")
    back = spark.read.option("mergeSchema", "true").parquet(path + "/b=1", path + "/b=2")
    return back.select("nationkey", "n_name", "batch_tag").orderBy("nationkey")


@register(
    "q161_csv_malformed_modes",
    oracle="""
    WITH base AS (SELECT event_id, event_id % 10 = 3 AS corrupt FROM events)
    SELECT 'dropmalformed' AS mode,
           CAST(count(*) FILTER (WHERE NOT corrupt) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_null_value,
           CAST(sum(event_id) FILTER (WHERE NOT corrupt) AS BIGINT) AS id_sum
    FROM base
    UNION ALL
    SELECT 'permissive',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE corrupt) AS BIGINT),
           CAST(sum(event_id) AS BIGINT)
    FROM base
    ORDER BY mode
    """,
    category="sources",
    doc=(
        "Malformed-record handling on CSV ingest — the operational reality "
        "of file-based pipelines: a CSV is written with every event_id ≡ 3 "
        "(mod 10) row carrying an unparseable value field, then read under "
        "PERMISSIVE (row kept, bad field nulled) and DROPMALFORMED (row "
        "discarded). The oracle derives both modes' row counts, null "
        "counts, and id sums from the injection rule alone, so the reader "
        "semantics are checked against ground truth, not against "
        "themselves."
    ),
)
def q161_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from highs_duckdb_spark.session import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="hds_q161_csv_")
    lines = ev.select(
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.when(F.col("event_id") % 10 == 3, F.lit("not-a-double")).otherwise(
                F.col("value").cast("string")
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    schema = "event_id long, value double"
    rows = []
    for mode in ("dropmalformed", "permissive"):
        df = spark.read.schema(schema).option("mode", mode.upper()).csv(path)
        agg = df.agg(
            F.count("*").alias("n_rows"),
            F.coalesce(
                F.sum(F.col("value").isNull().cast("long")), F.lit(0)
            ).alias("n_null_value"),
            F.coalesce(F.sum("event_id"), F.lit(0)).alias("id_sum"),
        ).collect()[0]
        rows.append(
            (mode, int(agg["n_rows"]), int(agg["n_null_value"]), int(agg["id_sum"]))
        )
    return local_rows_df(
        spark, rows, "mode string, n_rows bigint, n_null_value bigint, id_sum bigint"
    ).orderBy("mode")


@register(
    "q162_federated_format_join",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(1e-9 + CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    category="sources",
    doc=(
        "Federated multi-format join in ONE plan: the parquet fact "
        "(lineitem) joins a parquet dim (supplier), a CSV dim (nation, "
        "round-tripped through the CSV writer/reader with an explicit "
        "schema), and a JSON dim (region, through the JSON line "
        "writer/reader) — the lakehouse reality where reference data "
        "arrives in whatever format the producer chose. Catalyst treats "
        "all three scans uniformly (pushdown/pruning per format); dims "
        "broadcast, and the result is pinned to the all-parquet oracle so "
        "the format round-trips are proven lossless inside the join "
        "itself."
    ),
)
def q162_federated_format_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from highs_duckdb_spark.functions.money import cents, money_sum
    from highs_duckdb_spark.session import load_table

    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey", "l_extendedprice")
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation_src = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_regionkey")
    region_src = load_table(spark, "region", sf_dir).select("r_regionkey", "r_name")

    csv_dir = tempfile.mkdtemp(prefix="hds_q162_csv_")
    nation_src.write.mode("overwrite").option("header", "true").csv(csv_dir)
    nation = (
        spark.read.schema("n_nationkey long, n_regionkey long")
        .option("header", "true")
        .csv(csv_dir)
    )
    json_dir = tempfile.mkdtemp(prefix="hds_q162_json_")
    region_src.write.mode("overwrite").json(json_dir)
    region = spark.read.schema("r_regionkey long, r_name string").json(json_dir)

    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_lines"),
            money_sum(cents("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("r_name")
    )
