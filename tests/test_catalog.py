"""Catalog surface: CTAS, temp views, SHOW/DESCRIBE, DROP — the DDL the
reference exercises via DuckDB (reference: example_usage.sql:19-22,88-93;
SURVEY.md §2.2)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from highs_duckdb_spark.session import load_table, load_tables

SF = "/root/testdata/sf0.001"


def test_temp_view_roundtrip(spark):
    load_tables(spark, SF, names=("nation",))
    got = spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"]
    assert got == 25
    spark.catalog.dropTempView("nation")
    assert not any(t.name == "nation" for t in spark.catalog.listTables())


def test_ctas_show_describe_drop(spark):
    load_table(spark, "region", SF).createOrReplaceTempView("region_src")
    loc = tempfile.mkdtemp(prefix="hds_cat_")
    spark.sql("DROP TABLE IF EXISTS cat_regions")
    spark.sql(
        f"CREATE TABLE cat_regions USING parquet LOCATION '{loc}' AS "
        "SELECT r_regionkey, upper(r_name) AS r_name_up FROM region_src"
    )
    assert any(t.name == "cat_regions" for t in spark.catalog.listTables())
    cols = {c.name: c.dataType for c in spark.catalog.listColumns("cat_regions")}
    assert cols == {"r_regionkey": "int", "r_name_up": "string"}
    assert spark.table("cat_regions").count() == 5
    spark.sql("DROP TABLE cat_regions")
    assert not any(t.name == "cat_regions" for t in spark.catalog.listTables())


def test_insert_into(spark):
    loc = tempfile.mkdtemp(prefix="hds_ins_")
    spark.sql("DROP TABLE IF EXISTS cat_append")
    spark.sql(f"CREATE TABLE cat_append (k INT, v STRING) USING parquet LOCATION '{loc}'")
    spark.sql("INSERT INTO cat_append VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO cat_append SELECT n_nationkey, n_name FROM parquet.`%s/nation.parquet`" % SF)
    assert spark.table("cat_append").count() == 27
    spark.sql("DROP TABLE cat_append")


def test_global_temp_view(spark):
    load_table(spark, "supplier", SF).createOrReplaceGlobalTempView("gsupp")
    n = spark.sql("SELECT count(*) AS n FROM global_temp.gsupp").collect()[0]["n"]
    assert n == 10
    spark.catalog.dropGlobalTempView("gsupp")


def test_cache_table(spark):
    df = load_table(spark, "part", SF)
    df.createOrReplaceTempView("part_cache_test")
    spark.catalog.cacheTable("part_cache_test")
    try:
        assert spark.catalog.isCached("part_cache_test")
        assert spark.table("part_cache_test").filter(F.col("p_size") > 10).count() >= 0
    finally:
        spark.catalog.uncacheTable("part_cache_test")
        spark.catalog.dropTempView("part_cache_test")
