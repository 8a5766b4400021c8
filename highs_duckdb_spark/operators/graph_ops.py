"""Graph operators over the relationally-encoded trade graph.

The reference encodes its network-flow graph relationally (arc variables
``x_i_j`` — reference: network_flow_example.sql:10-58); the natural Spark
form is likewise an edges DataFrame. These operators derive a nation-level
trade graph from the TPC-H-ish tables (an edge = customers of nation A
bought from suppliers of nation B) and run classic distributed graph
algorithms on it, complementing g01 (PageRank, operators/clustering.py)
and d07 (connected components).

Scale shapes:

- The edge list derives from one lineitem ⋈ orders shuffle join (fact-fact
  on the natural key) with dimension joins broadcast; edge aggregation
  shuffles only (n1, n2) int pairs.
- Triangle enumeration is the standard two-hop join on ordered vertices
  (a < b < c), which bounds each edge to one orientation — no factorial
  blowup; at 100 TB you'd pre-bucket edges by src.
- BFS is iterative frontier relaxation: k bounded join+min rounds, the
  distributed equivalent of the oracle's recursive CTE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table

#: the EDGE_TOP_K densest trade routes form the graph. A fixed-size graph
#: is the scale-invariant choice: a relative density threshold (the old
#: 1.5 x mean) degenerates as data grows — per-pair counts concentrate
#: toward the mean by the law of large numbers, and at sf0.1 the 1.5x rule
#: already kept ZERO of the ~300 nation pairs. Top-K with a deterministic
#: (cnt DESC, n1, n2) tie-break keeps the same ~20% of pairs at every
#: scale factor, exactly (no quantile interpolation to diverge between
#: engines). The 100-TB shape is unchanged: facts reduce to a bounded
#: nation graph, and the graph algorithms' cost depends on K, not corpus
#: size.
EDGE_TOP_K = 60

_EDGES_SQL = f"""
    trade AS (
      SELECT least(c_nationkey, s_nationkey) AS n1,
             greatest(c_nationkey, s_nationkey) AS n2,
             count(*) AS cnt
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE c_nationkey <> s_nationkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
      FROM (
        SELECT n1, n2,
               row_number() OVER (ORDER BY cnt DESC, n1, n2) AS rk
        FROM trade
      )
      WHERE rk <= {EDGE_TOP_K}
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (n1 < n2) nation trade edges above the density threshold."""
    from highs_duckdb_spark.plans.cbo import JoinGraph

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    # CBO-planned three-fact tree (same shape as q101); columns= opts the
    # lineitem⋈orders pair into projection matching, so the whole g01-g07
    # family inherits the lineitem_orders materialization under a layout
    g = JoinGraph(spark, sf_dir)
    g.fact("lineitem", li, columns=("l_suppkey",))
    g.fact("orders", orders, columns=("o_custkey",))
    g.fact("customer", cust)
    g.edge("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.edge("orders", "o_custkey", "customer", "c_custkey")
    g.dim("supplier", sup, F.col("l_suppkey") == F.col("s_suppkey"), after=("lineitem",))
    trade = (
        g.plan()
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("n1"),
            F.greatest("c_nationkey", "s_nationkey").alias("n2"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    # top-K on a ~300-row aggregate: the single-partition window is free
    # here (trade is nation-pair-sized at ANY corpus scale, by construction)
    w = Window.orderBy(F.desc("cnt"), F.asc("n1"), F.asc("n2"))
    return (
        trade.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= EDGE_TOP_K)
        .select(F.col("n1").cast("bigint"), F.col("n2").cast("bigint"))
    )


@register(
    "g02_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT e1.n1 AS a, e1.n2 AS b, e2.n2 AS c
    FROM edges e1
    JOIN edges e2 ON e2.n1 = e1.n2
    JOIN edges e3 ON e3.n1 = e1.n1 AND e3.n2 = e2.n2
    ORDER BY a, b, c
    """,
    category="graph",
    doc=(
        "Triangle enumeration on the nation trade graph: ordered-vertex "
        "two-hop join (a<b<c) so each triangle appears exactly once — the "
        "standard distributed formulation (one self-join shuffle on the "
        "shared vertex, then an edge-existence semi-check)."
    ),
)
def g02_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pin the derived edge list before the triangle self-joins: e is
    # referenced three times, and each reference would otherwise re-run
    # the 4-way fact join that derives it (6 scans of every base table in
    # the physical plan). Same build-the-graph-then-iterate shape as g03.
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = e.select(F.col("n1").alias("a"), F.col("n2").alias("b"))
    e2 = e.select(F.col("n1").alias("b"), F.col("n2").alias("c"))
    e3 = e.select(F.col("n1").alias("a"), F.col("n2").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
        .transform(present_sorted, "a", "b", "c")
    )


BFS_SOURCE = 0
BFS_MAX_HOPS = 4


@register(
    "g03_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    adj AS (
      SELECT n1 AS src, n2 AS dst FROM edges
      UNION ALL
      SELECT n2 AS src, n1 AS dst FROM edges
    ),
    walk(node, hops) AS (
      SELECT CAST({BFS_SOURCE} AS BIGINT), 0
      UNION ALL
      SELECT a.dst, w.hops + 1
      FROM walk w JOIN adj a ON a.src = w.node
      WHERE w.hops < {BFS_MAX_HOPS}
    )
    SELECT node, CAST(min(hops) AS BIGINT) AS hops
    FROM walk GROUP BY node ORDER BY node
    """,
    category="graph",
    doc=(
        f"Single-source BFS (source {BFS_SOURCE}, <= {BFS_MAX_HOPS} hops) on "
        "the undirected trade graph: iterative frontier relaxation — each "
        "round joins the frontier with the adjacency list and keeps new "
        "minima, the distributed equivalent of the oracle's recursive CTE "
        "(which enumerates walks; min() collapses them to shortest hops)."
    ),
)
def g03_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialize the derived edge list ONCE: the nation graph is bounded
    # (≤ 25 nodes at any scale factor), but its derivation is a 4-way
    # fact join — without pinning, that subplan is re-planned and its
    # reduce side re-executed in every one of the BFS_MAX_HOPS rounds
    # (measured ~8x the query cost). This is "build the graph, then
    # iterate on the graph" — the shape every distributed BFS/PageRank
    # uses at scale.
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = e.select(F.col("n1").alias("src"), F.col("n2").alias("dst")).unionAll(
        e.select(F.col("n2").alias("src"), F.col("n1").alias("dst"))
    )
    # 25 nodes: the adjacency list broadcasts so each round is a broadcast
    # join, never an all-to-all shuffle. At 100 TB you'd also checkpoint
    # `dist` every few rounds to cut lineage.
    adj = F.broadcast(adj)
    # Seed independently of the graph: the source is at hops 0 even when it
    # is isolated (the oracle's recursive CTE anchors on the source row, so
    # deriving the seed from adj.limit(1) returned 0 rows on an edgeless
    # graph — caught by the sf0.1 parity run).
    dist = spark.range(1).select(
        F.lit(BFS_SOURCE).cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("hops"),
    )
    frontier = dist
    for _ in range(BFS_MAX_HOPS):
        reached = (
            frontier.join(adj, frontier.node == adj.src)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        new_dist = (
            dist.unionAll(reached).groupBy("node").agg(F.min("hops").alias("hops"))
        )
        # next frontier = nodes whose distance improved this round; with a
        # 25-node graph recomputing from the merged table is cheapest
        frontier = new_dist.join(dist.select("node", F.col("hops").alias("old")), "node", "left").filter(
            F.col("old").isNull() | (F.col("hops") < F.col("old"))
        ).select("node", "hops")
        dist = new_dist
    return dist.select("node", F.col("hops").cast("bigint").alias("hops")).transform(
        present_sorted, "node"
    )


@register(
    "g04_degree_stats",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT n1 AS node FROM edges
        UNION ALL
        SELECT n2 AS node FROM edges
      ) GROUP BY node
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS example_node
    FROM deg GROUP BY degree ORDER BY degree
    """,
    category="graph",
    doc=(
        "Degree-distribution histogram of the nation trade graph — the "
        "first thing anyone profiles before running PageRank/CC at scale "
        "(the max-degree node decides your skew strategy). Endpoints "
        "explode map-side (each edge contributes two rows), degrees "
        "aggregate on the node key with map-side combine, and the "
        "histogram runs over degree-sized data. Edge derivation is the "
        "same checkpointed 4-way join the other graph ops share."
    ),
)
def g04_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = e.select(F.col("n1").alias("node")).unionAll(
        e.select(F.col("n2").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy(F.col("degree").cast("bigint").alias("degree"))
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("example_node"),
        )
        .transform(present_sorted, "degree")
    )


@register(
    "g05_jaccard_link_prediction",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT n1 AS src, n2 AS dst FROM edges UNION ALL SELECT n2, n1 FROM edges),
    deg AS (SELECT src AS node, count(*) AS d FROM adj GROUP BY src),
    common AS (
      SELECT a1.dst AS a, a2.dst AS b, count(*) AS n_common
      FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
      GROUP BY 1, 2),
    cand AS (
      SELECT c.a, c.b, c.n_common FROM common c
      WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.n1 = c.a AND e.n2 = c.b))
    SELECT c.a, c.b, CAST(c.n_common AS BIGINT) AS n_common,
           round(1e-9 + CAST(c.n_common AS DOUBLE) / (da.d + db.d - c.n_common), 6)
             AS jaccard
    FROM cand c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
    ORDER BY a, b
    """,
    category="graph",
    doc=(
        "Neighborhood-Jaccard link prediction on the nation trade graph: "
        "for every NON-adjacent vertex pair sharing ≥1 neighbor, "
        "|Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)| — the classic common-neighbors "
        "recommender score. Distributed shape: one wedge self-join on the "
        "shared middle vertex (the same shuffle g02's triangles use), "
        "anti-join against the edge list to keep only predicted links, "
        "degree table joined in; the checkpointed edge list is built once "
        "for all graph ops. Integer counts + one rounded division, so both "
        "engines agree exactly."
    ),
)
def g05_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = e.select(F.col("n1").alias("src"), F.col("n2").alias("dst")).unionAll(
        e.select(F.col("n2").alias("src"), F.col("n1").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    a1 = adj.select(F.col("src").alias("mid"), F.col("dst").alias("a"))
    a2 = adj.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    common = (
        a1.join(a2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    cand = common.join(
        e, (common.a == e.n1) & (common.b == e.n2), "left_anti"
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        cand.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.lit(1e-9)
                + F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .transform(present_sorted, "a", "b")
    )


@register(
    "g06_adamic_adar",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT n1 AS src, n2 AS dst FROM edges UNION ALL SELECT n2, n1 FROM edges),
    deg AS (SELECT src AS node, count(*) AS d FROM adj GROUP BY src),
    wedges AS (
      SELECT a1.dst AS a, a2.dst AS b, a1.src AS mid
      FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst),
    scored AS (
      SELECT w.a, w.b, count(*) AS n_common,
             sum(1.0 / ln(dm.d)) AS aa
      FROM wedges w JOIN deg dm ON dm.node = w.mid
      GROUP BY w.a, w.b),
    cand AS (
      SELECT s.* FROM scored s
      WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.n1 = s.a AND e.n2 = s.b))
    SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
           round(1e-9 + aa, 6) AS adamic_adar
    FROM cand ORDER BY a, b
    """,
    category="graph",
    doc=(
        "Adamic-Adar link prediction: common neighbors weighted by "
        "1/ln(degree) — rare shared neighbors count more than hubs, the "
        "standard refinement of g05's unweighted Jaccard. Same wedge "
        "shuffle; the middle vertex's degree joins onto the wedge before "
        "the (a,b) aggregate (every common neighbor has degree ≥ 2, so "
        "ln never vanishes); anti-join keeps non-edges only."
    ),
)
def g06_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = e.select(F.col("n1").alias("src"), F.col("n2").alias("dst")).unionAll(
        e.select(F.col("n2").alias("src"), F.col("n1").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    a1 = adj.select(F.col("src").alias("mid"), F.col("dst").alias("a"))
    a2 = adj.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    wedges = a1.join(a2, "mid").filter(F.col("a") < F.col("b"))
    scored = (
        wedges.join(
            F.broadcast(deg.select(F.col("node").alias("mid"), "d")), "mid"
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("aa"),
        )
    )
    return (
        scored.join(e, (scored.a == e.n1) & (scored.b == e.n2), "left_anti")
        .select(
            "a",
            "b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(F.lit(1e-9) + F.col("aa"), 6).alias("adamic_adar"),
        )
        .transform(present_sorted, "a", "b")
    )


@register(
    "g07_clustering_coefficient",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT n1 AS src, n2 AS dst FROM edges UNION ALL SELECT n2, n1 FROM edges),
    deg AS (SELECT src AS node, count(*) AS d FROM adj GROUP BY src),
    tri AS (
      SELECT v.node, count(*) AS t FROM (
        SELECT e1.n1 AS a, e1.n2 AS b, e2.n2 AS c
        FROM edges e1 JOIN edges e2 ON e2.n1 = e1.n2
        JOIN edges e3 ON e3.n1 = e1.n1 AND e3.n2 = e2.n2) tris,
      LATERAL (SELECT unnest([tris.a, tris.b, tris.c]) AS node) v
      GROUP BY v.node)
    SELECT d.node, CAST(d.d AS BIGINT) AS degree,
           CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
           round(1e-9 + CASE WHEN d.d >= 2
                 THEN 2.0 * coalesce(t.t, 0) / (d.d * (d.d - 1)) ELSE 0 END, 6)
             AS clustering
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    ORDER BY d.node
    """,
    category="graph",
    doc=(
        "Local clustering coefficient per vertex: 2·Δ(v) / (deg·(deg−1)) — "
        "how close each node's neighborhood is to a clique, the standard "
        "small-world statistic. Triangles come from g02's ordered-vertex "
        "enumeration (each triangle credits its three corners via one "
        "explode), degrees from the adjacency count; everything after the "
        "wedge join runs over node-cardinality data. Integer counts "
        "through the rounded ratio."
    ),
)
def g07_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = e.select(F.col("n1").alias("src"), F.col("n2").alias("dst")).unionAll(
        e.select(F.col("n2").alias("src"), F.col("n1").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e1 = e.select(F.col("n1").alias("a"), F.col("n2").alias("b"))
    e2 = e.select(F.col("n1").alias("b"), F.col("n2").alias("c"))
    e3 = e.select(F.col("n1").alias("a"), F.col("n2").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    tri = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    clustering = F.when(
        F.col("d") >= 2,
        2.0 * F.coalesce(F.col("t"), F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(F.broadcast(tri), "node", "left")
        .select(
            "node",
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.round(F.lit(1e-9) + clustering, 6).alias("clustering"),
        )
        .transform(present_sorted, "node")
    )
