"""Physical-plan audits: the plans must be the ones you'd want at 100 TB —
filters pushed into the parquet scan, projections pruned, small dims
broadcast, top-k without a global sort, fused codegen on the hot path."""

from __future__ import annotations

import pyspark.sql.functions as F

from highs_duckdb_spark.operators.relational import (
    q01_pricing_summary,
    q07_global_agg,
    q10_join_broadcast,
    q11_join_multiway,
    q42_topk,
    q64_tpch_q3_shipping_priority,
)
from highs_duckdb_spark.operators.sources_ops import _tmpdir
from highs_duckdb_spark.plans.audit import (
    has_broadcast_hash_join,
    has_shuffle_exchange,
    has_take_ordered,
    partition_filters,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
from highs_duckdb_spark.session import load_table
from highs_duckdb_spark.sources.io import write_partitioned_parquet

SF = "/root/testdata/sf0.001"


def test_q01_filter_pushed_to_scan(spark):
    df = q01_pricing_summary(spark, SF)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed


def test_q01_column_pruning(spark):
    df = q01_pricing_summary(spark, SF)
    (scan_cols,) = read_schema_columns(df)
    # 11-column table; the query needs exactly these 7
    assert sorted(scan_cols) == [
        "l_discount",
        "l_extendedprice",
        "l_linestatus",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
        "l_tax",
    ]


def test_q07_pushdown_both_predicates(spark):
    pushed = pushed_filters(q07_global_agg(spark, SF))
    assert any("l_discount" in f for f in pushed)
    assert any("l_quantity" in f for f in pushed)


def test_q10_broadcasts_dim(spark):
    df = q10_join_broadcast(spark, SF)
    assert has_broadcast_hash_join(df)


def test_q11_star_join_broadcasts(spark):
    df = q11_join_multiway(spark, SF)
    assert has_broadcast_hash_join(df)


def test_q42_topk_no_global_sort(spark):
    df = q42_topk(spark, SF)
    assert has_take_ordered(df)


def test_q64_pushes_filters_into_all_scans(spark):
    pushed = pushed_filters(q64_tpch_q3_shipping_priority(spark, SF))
    assert any("c_mktsegment" in f for f in pushed)
    assert any("o_orderdate" in f for f in pushed)
    assert any("l_shipdate" in f for f in pushed)


def test_codegen_fuses_agg_pipeline(spark):
    df = q01_pricing_summary(spark, SF)
    assert wholestage_codegen_spans(df) >= 1


def test_partition_pruning_on_partitioned_layout(spark):
    orders = load_table(spark, "orders", SF).withColumn("yr", F.year("o_orderdate").cast("int"))
    path = _tmpdir("prunetest")
    write_partitioned_parquet(orders, path, ["yr"])
    back = spark.read.parquet(path).filter(F.col("yr") == 1997)
    pf = partition_filters(back)
    assert any("yr" in f for f in pf), pf
    # and the data filter did NOT land in the post-scan filter set: it's
    # partition-level, so non-matching directories are never opened
    agg = back.agg(F.count("*").alias("n"))
    assert agg.collect()[0]["n"] > 0


def test_bucketed_join_has_no_shuffle(spark):
    """Joining two tables bucketed on the join key must not shuffle either
    side — the whole point of bucketing at scale."""
    import os
    from highs_duckdb_spark.plans.audit import has_shuffle_exchange

    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    loc = _tmpdir("buckettest")
    for tbl in ("bt_orders", "bt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    orders.write.mode("overwrite").option("path", os.path.join(loc, "o")).bucketBy(
        4, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("bt_orders")
    li.write.mode("overwrite").option("path", os.path.join(loc, "l")).bucketBy(
        4, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("bt_lineitem")
    try:
        bo, bl = spark.table("bt_orders"), spark.table("bt_lineitem")
        joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        assert not has_shuffle_exchange(joined)
        # sanity: unbucketed equivalent DOES shuffle
        plain = (
            orders.hint("merge")
            .join(li, orders.o_orderkey == li.l_orderkey)
            .select("o_orderkey", "l_quantity")
        )
        assert has_shuffle_exchange(plain)
    finally:
        for tbl in ("bt_orders", "bt_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_q104_filters_pushed_and_dims_broadcast(spark):
    """Q10 shape: the returnflag filter must reach the lineitem scan, the
    orderdate window the orders scan, and nation must broadcast."""
    from highs_duckdb_spark.operators.tpch_extra2 import q104_returned_items

    df = q104_returned_items(spark, SF)
    pushed = [f for scan in [pushed_filters(df)] for f in scan]
    assert any("l_returnflag" in f for f in pushed), pushed
    assert any("o_orderdate" in f for f in pushed), pushed
    assert has_broadcast_hash_join(df)


def test_q100_semi_join_stays_semi(spark):
    """The EXISTS decorrelation must produce a semi join (no row blowup),
    with the date filter pushed to the orders scan."""
    from highs_duckdb_spark.operators.tpch_extra2 import q100_order_priority_check

    df = q100_order_priority_check(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_q111_single_fact_shuffle(spark):
    """The last-to-ship decorrelation must shuffle the fact table ONCE on
    l_orderkey (groupBy + both windows reuse the same partitioning) and
    broadcast the supplier dim."""
    from highs_duckdb_spark.operators.tpch_extra2 import q111_last_to_ship_suppliers

    df = q111_last_to_ship_suppliers(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    fact_exchanges = plan.count("Exchange hashpartitioning(l_orderkey")
    assert fact_exchanges == 1, f"expected 1 fact shuffle, plan:\n{plan[:3000]}"
    assert has_broadcast_hash_join(df)


def test_q77_merge_single_copartitioned_shuffle(spark):
    """MERGE compiles to ONE full-outer join co-partitioned on the merge
    key (full-outer can never broadcast — both sides must see all rows);
    each side is shuffled exactly once."""
    from highs_duckdb_spark.operators.merge_ops import q77_merge_upsert

    df = q77_merge_upsert(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert plan.count("Exchange hashpartitioning(c_custkey") == 1, plan[:3000]


def test_v04_v05_vector_ops_zero_shuffle(spark):
    """Quantization and projection are pure map passes: no shuffle at all
    (present_sorted's coalesce is a narrow dependency)."""
    from highs_duckdb_spark.operators.vectors import v06_int8_quantize, v05_random_projection

    assert not has_shuffle_exchange(v06_int8_quantize(spark, SF))
    assert not has_shuffle_exchange(v05_random_projection(spark, SF))


def test_p04_p05_single_stratum_shuffle(spark):
    """Stratified sample and token-budget curriculum shuffle ONCE on the
    stratum key (the window exchange; p05's groupBy(lang) reuses it)."""
    from highs_duckdb_spark.operators.pipeline_ops import (
        p04_stratified_sample,
        p05_token_budget_curriculum,
    )

    for df in (p04_stratified_sample(spark, SF), p05_token_budget_curriculum(spark, SF)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_dq01_broadcasts_stats(spark):
    """The 5-row moments table joins back by broadcast — the fact side is
    never shuffled for the z-score pass."""
    from highs_duckdb_spark.operators.relational3 import dq01_zscore_outliers

    df = dq01_zscore_outliers(spark, SF)
    assert has_broadcast_hash_join(df)


def test_g03_bfs_broadcasts_adjacency(spark):
    """Every BFS relaxation round joins the frontier against a broadcast
    adjacency list — no all-to-all shuffle per round."""
    from highs_duckdb_spark.operators.graph_ops import g03_bfs_hops

    df = g03_bfs_hops(spark, SF)
    assert has_broadcast_hash_join(df)


def test_q65_fact_table_never_hash_build_side(spark):
    """The 100-TB contract: lineitem streams through every broadcast join.

    Regression for the dims-first formulation where the static planner chose
    the whole lineitem scan as a BroadcastHashJoin build side (legal under
    the local 64MB threshold, fatal at scale)."""
    from highs_duckdb_spark.operators.relational import q65_tpch_q5_local_volume
    from highs_duckdb_spark.plans.audit import broadcast_build_scans

    builds = broadcast_build_scans(q65_tpch_q5_local_volume(spark, SF))
    assert "lineitem" not in builds, builds


def test_q15_q16_generate_map_side(spark):
    """UNPIVOT and posexplode are Generate nodes: no shuffle before the
    single-partition presentation coalesce."""
    from highs_duckdb_spark.operators.relational4 import (
        q15_unpivot,
        q16_posexplode_ordinality,
    )

    assert not has_shuffle_exchange(q15_unpivot(spark, SF))
    assert not has_shuffle_exchange(q16_posexplode_ordinality(spark, SF))


def test_dq02_profiles_in_one_scan(spark):
    """Multi-column null/distinct profile must read the table once (expand +
    aggregate), not once per column like the naive oracle."""
    from highs_duckdb_spark.operators.relational4 import dq02_completeness_profile
    from highs_duckdb_spark.plans.audit import read_schema_columns as rsc

    scans = rsc(dq02_completeness_profile(spark, SF))
    assert len(scans) == 1, scans


def test_q45_orders_scan_pruned(spark):
    from highs_duckdb_spark.operators.relational4 import q45_generator_calendar
    from highs_duckdb_spark.plans.audit import read_schema_columns as rsc

    (scan,) = rsc(q45_generator_calendar(spark, SF))
    assert sorted(scan) == ["o_orderdate", "o_orderkey"]


def test_s01_single_corpus_scan_kernel(spark):
    """Brute-force cosine: exactly one embeddings scan feeding the pandas
    kernel; the only hash shuffle is the per-query window top-k."""
    from highs_duckdb_spark.operators.similarity import s01_cosine_topk
    from highs_duckdb_spark.plans.audit import formatted_plan, read_schema_columns as rsc

    df = s01_cosine_topk(spark, SF)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    scans = rsc(df)
    assert len(scans) == 1 and sorted(scans[0]) == ["embedding", "label", "vec_id"]


def test_q27_ratio_single_scan(spark):
    """Ratio-to-report must not re-scan for the denominator: one orders
    scan, the global total comes from a window over the aggregate."""
    from highs_duckdb_spark.operators.relational4 import q27_ratio_to_report
    from highs_duckdb_spark.plans.audit import read_schema_columns as rsc

    scans = rsc(q27_ratio_to_report(spark, SF))
    assert len(scans) == 1, scans


def test_q47_forward_asof_single_shuffle(spark):
    """Union-and-carry: exactly one hash shuffle (user_id window), no join."""
    from highs_duckdb_spark.operators.relational4 import q47_asof_forward_tolerance
    from highs_duckdb_spark.plans.audit import simple_plan

    plan = simple_plan(q47_asof_forward_tolerance(spark, SF))
    assert plan.count("hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_dq03_anti_join_probes(spark):
    from highs_duckdb_spark.operators.relational4 import dq03_referential_integrity
    from highs_duckdb_spark.plans.audit import simple_plan

    plan = simple_plan(dq03_referential_integrity(spark, SF))
    assert "LeftAnti" in plan


def test_q112_single_fact_shuffle_and_pruned_scan(spark):
    """Q11 shape: the global threshold comes from a window over the
    ALREADY-AGGREGATED per-part rows — the fact table shuffles once on
    l_partkey and is never scanned twice; the scan reads only 3 columns."""
    from highs_duckdb_spark.operators.tpch_extra2 import q112_important_part_values
    from highs_duckdb_spark.plans.audit import read_schema_columns

    df = q112_important_part_values(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1, plan[:3000]
    schemas = read_schema_columns(df)
    assert len(schemas) == 1, f"lineitem must be scanned once, got {len(schemas)} scans"
    assert sorted(schemas[0]) == ["l_discount", "l_extendedprice", "l_partkey"]


def test_q113_single_fact_shuffle_broadcast_dims(spark):
    """Q20 shape: one fact shuffle on l_partkey (pair groupBy + per-part
    window both satisfied by the subset rule); promo parts and the
    supplier lookup are broadcast; the shipdate filter reaches the scan."""
    from highs_duckdb_spark.operators.tpch_extra2 import q113_dominant_part_suppliers
    from highs_duckdb_spark.plans.audit import has_broadcast_hash_join, pushed_filters

    df = q113_dominant_part_suppliers(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1, plan[:3000]
    assert has_broadcast_hash_join(df)
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_d08_broadcast_probe_no_corpus_shuffle(spark):
    """Decontamination probes the broadcast benchmark gram set: the only
    hash exchange is the post-join doc_id aggregation of contaminated
    rows — the exploded training grams themselves never shuffle."""
    from highs_duckdb_spark.operators.dedup import d08_decontamination
    from highs_duckdb_spark.plans.audit import has_broadcast_hash_join

    df = d08_decontamination(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert has_broadcast_hash_join(df)
    assert "Exchange hashpartitioning(g" not in plan, plan[:3000]


def test_q28_single_user_shuffle(spark):
    """Cohort retention: first-seen agg, per-(user,week) dedup and the join
    all cluster on user_id; the events table shuffles on user-derived keys,
    never twice on the same branch."""
    from highs_duckdb_spark.operators.relational4 import q28_cohort_retention

    df = q28_cohort_retention(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan[:3000]


def test_s06_broadcasts_centroids(spark):
    """SemDeDup: the K-row centroid table broadcasts into the assignment
    cross product (BroadcastNestedLoopJoin — keyless by design, K rows);
    the corpus itself is never the broadcast side of a CartesianProduct.
    The assignment subplan is inspected pre-checkpoint (s06 pins its
    result, so the final plan shows no corpus scan at all — also
    asserted)."""
    from highs_duckdb_spark.operators.similarity import (
        _semdedup_assignment,
        s06_semdedup,
    )

    asg = _semdedup_assignment(spark, SF)
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]
    final = s06_semdedup(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in final  # checkpoint pins the assignment


def test_q64_fact_never_hash_build_side(spark):
    """Q3 shape: the broadcast (hash build) side must be the bounded
    customer-orders subtree, never the lineitem fact scan."""
    from highs_duckdb_spark.operators.relational import q64_tpch_q3_shipping_priority

    df = q64_tpch_q3_shipping_priority(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for seg in plan.split("BroadcastExchange")[1:]:
        # only the subtree UNDER the broadcast, i.e. until the next join
        built = seg.split("BroadcastHashJoin")[0]
        assert "lineitem" not in built, plan[:3000]


def test_registry_wide_no_raw_fact_broadcast(spark):
    """Registry-wide invariant: NO query may put a raw (un-aggregated,
    un-bounded) fact-table scan — lineitem, orders or events — under a
    BroadcastExchange. A static broadcast decision is never revisited by
    AQE, so a fact-as-build-side plan that is merely legal at test scale
    becomes an OOM at 100 TB. Exempt: aggregated key sets, and scans
    bounded by a pushed literal-key filter (selectivity fixed at any SF,
    e.g. q85's l_orderkey < 200 slice or q09's o_orderkey < 200)."""
    from highs_duckdb_spark.operators import QUERIES

    FACTS = ("lineitem", "orders", "events")
    offenders = []
    for name in sorted(QUERIES):
        if name.startswith(("qs", "m0")):  # streams / multimodal stubs
            continue
        df = QUERIES[name].builder(spark, SF)
        lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            indent = len(ln) - len(ln.lstrip(" :+-*("))
            sub = []
            for l2 in lines[i + 1:]:
                ind2 = len(l2) - len(l2.lstrip(" :+-*("))
                if ind2 <= indent and l2.strip():
                    break
                sub.append(l2)
            subtxt = "\n".join(sub)
            if "Aggregate" in subtxt:
                continue
            hit = None
            for fact in FACTS:
                for scan_ln in subtxt.splitlines():
                    if "FileScan" in scan_ln and f"/{fact}.parquet" in scan_ln:
                        # literal-key bound => fixed row count at any SF
                        if "key#" in scan_ln and "< 200" in scan_ln:
                            continue
                        hit = (fact, name)
            if hit:
                offenders.append(hit)
                break
    assert not offenders, f"raw fact under broadcast in: {offenders}"


def test_p09_pipeline_two_shuffles(spark):
    """The composed corpus pipeline (quality gate -> dedup -> split -> pack
    -> summary) moves data exactly twice: once on the md5 fingerprint for
    the dedup window, once on (split, lang) — reused by both the packing
    window and the final aggregate (plus only a presentation sort)."""
    from highs_duckdb_spark.operators.pipeline_ops import p09_full_corpus_pipeline

    df = p09_full_corpus_pipeline(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]
    # and the length gate reaches the parquet scan
    assert "PushedFilters" in plan and "n_chars" in plan.split("PushedFilters", 1)[1][:200], (
        plan[:3000]
    )


def test_bucketed_band_and_grid_joins_are_equi_joins(spark):
    """q140/q153 replace inequality joins with bucketed equi-joins: the
    physical plan must contain NO nested-loop/cartesian operator — that is
    the entire point of the bucketing at 100 TB."""
    from highs_duckdb_spark.operators.relational6 import q140_bucketed_band_join
    from highs_duckdb_spark.operators.relational7 import q153_grid_spatial_join
    from highs_duckdb_spark.plans.audit import formatted_plan

    for builder in (q140_bucketed_band_join, q153_grid_spatial_join):
        plan = formatted_plan(builder(spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan, builder.__name__
        assert "CartesianProduct" not in plan, builder.__name__


def test_q151_pit_join_is_equi_join(spark):
    """The point-in-time join must be an equi-join on the entity key with
    the validity interval as a post-join filter — not an interval
    nested-loop."""
    from highs_duckdb_spark.operators.relational7 import q151_point_in_time_join
    from highs_duckdb_spark.plans.audit import formatted_plan

    plan = formatted_plan(q151_point_in_time_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_v04_kmeans_bounded_lineage_and_maponly_rounds(spark):
    """VERDICT r02: k-means rounds must not deepen lineage. The returned
    plan hangs directly off the checkpointed scan (no parquet rescans, no
    per-round stacking), and a round's partial-sum job is map-only — zero
    Exchange (the old posexplode+groupBy recompute shuffled n×dim rows
    per round)."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.operators.vectors import (
        _as_double,
        _kmeans_partials_factory,
        v04_kmeans_lite,
    )
    from highs_duckdb_spark.session import load_table

    final = v04_kmeans_lite(spark, SF)
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan[:2000]  # checkpoint-pinned
    assert plan.count("ArrowEvalPython") <= 1, plan[:2000]  # one assign pass

    emb = load_table(spark, "embeddings", SF).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=True)
    cents = [r["v"] for r in emb.filter(F.col("vec_id") < 5).collect()]
    round_job = emb.select("v").mapInPandas(
        _kmeans_partials_factory(cents), "cluster long, cnt long, vsum array<double>"
    )
    rplan = round_job._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in rplan, rplan[:2000]


def test_s17_s18_jvm_cosine_no_cartesian(spark):
    """The JVM cosine paths express the cross-score as explode+equi-join:
    a BroadcastHashJoin on query_id must appear, and no nested-loop or
    cartesian operator may."""
    from highs_duckdb_spark.operators.similarity import (
        s17_cosine_topk_jvm,
        s18_hard_negative_mining,
    )

    for builder in (s17_cosine_topk_jvm, s18_hard_negative_mining):
        df = builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:800]
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_q177_no_expand(spark):
    """The two-pass distinct-agg rewrite must not plan Spark's 3x Expand
    (that operator tripling the fact shuffle is exactly what it avoids);
    q20 (the native surface) is expected to keep it."""
    from highs_duckdb_spark.operators.relational import (
        q20_distinct_agg,
        q177_distinct_agg_twopass,
    )

    assert "Expand" not in (
        q177_distinct_agg_twopass(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in (
        q20_distinct_agg(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_t25_countmin_bounded_aggregation_state(spark):
    """The Count-Min build aggregates to at most d*w cells however large
    the corpus — assert the sketch side's aggregate keys really are
    (r, bucket) and never the token, straight from the physical plan."""
    import re

    from highs_duckdb_spark.operators.text3 import t25_countmin_heavy_hitters

    df = t25_countmin_heavy_hitters(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= 15
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the sketch-build aggregate is the one producing cell_count: its
    # grouping list must be the (r, bucket) struct fields and NOT the token
    # (state would then grow with the vocabulary instead of ≤ d·w cells)
    sketch_aggs = [
        ln for ln in plan.splitlines() if "Aggregate [" in ln and "AS cell_count" in ln
    ]
    assert sketch_aggs, f"no cell_count aggregate in plan:\n{plan}"
    for ln in sketch_aggs:
        keys = re.search(r"Aggregate \[([^\]]*)\]", ln).group(1)
        assert "tok" not in keys, f"sketch aggregate keyed by token: {ln}"
    # and those grouping expressions really are the struct's r/bucket fields
    assert re.search(r"\brb#\d+\.r AS ", plan), plan
    assert re.search(r"\brb#\d+\.bucket AS ", plan), plan
