"""Iterative graph clustering for dedup: connected components over the
near-duplicate pair graph, so each group of transitively-similar documents
gets one canonical representative (min doc_id in the component).

Algorithm: label propagation to a fixed point — every node starts labeled
with its own id; each round, a node adopts the minimum label in its
neighborhood; converged when no label changes. Each round is one join +
one aggregation (shuffles keyed by node), the standard large-graph CC
pattern when you don't have GraphX/GraphFrames on the classpath. Round
count is O(graph diameter); near-dup graphs are shallow (components are
cliques-ish), so it converges in 2-3 rounds here.

The DuckDB oracle computes the same fixed point with a recursive CTE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.operators.dedup import (
    NEAR_DUP_DOC_LIMIT as _DOC_LIMIT,
)
from highs_duckdb_spark.operators.dedup import (
    NEAR_DUP_THRESHOLD as _THRESH,
)
from highs_duckdb_spark.operators.dedup import similar_pair_frames
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import load_table


def connected_components(nodes: DataFrame, edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(node) + (src,dst) undirected edges → (node, component) with
    component = min node id in the component. Label propagation; each round
    materializes via localCheckpoint to keep the plan from growing
    unboundedly (lineage truncation, the standard iterative-algorithm
    hygiene on Spark)."""
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # edges are reused every round: never recompute their lineage
    labels = nodes.select(F.col("node"), F.col("node").alias("component"))
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            both.join(labels, both.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds max_rounds); raise max_rounds"
        )
    return labels


@register(
    "d07_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN length(toks) >= 3
               THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, length(toks) - 1)]
               ELSE [array_to_string(toks, ' ')] END) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < {_DOC_LIMIT})
    ),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      WHERE CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (length(a.shingles) + length(b.shingles)
               - length(list_intersect(a.shingles, b.shingles))) >= {_THRESH}
    ),
    walk(node, component) AS (
      SELECT doc_id, doc_id FROM sh
      UNION
      SELECT e.src, w.component
      FROM walk w JOIN edges e ON e.dst = w.node
      WHERE w.component < e.src
    )
    SELECT node AS doc_id, CAST(min(component) AS BIGINT) AS component
    FROM walk GROUP BY node ORDER BY doc_id
    """,
    category="dedup",
    doc=(
        "Connected components over the near-dup graph (iterative label "
        "propagation with lineage checkpointing) — transitive dedup "
        "clusters with min-id representatives; oracle via recursive CTE."
    ),
)
def d07_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < _DOC_LIMIT)
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges, _ = similar_pair_frames(spark, sf_dir)
    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint").alias("component")
    ).orderBy("doc_id")


def _pagerank_oracle_sql(iters: int = 5, n: int = 25, d: float = 0.85) -> str:
    """Chained-CTE power iteration (recursive-CTE-free, so the aggregate in
    the loop body is plain SQL). Each iteration rounds to 9 decimals with a
    +1e-12 nudge — double divergence between engines is ~1e-15/step, so the
    snap keeps Spark and DuckDB bit-identical (same convention as the money
    rounding, finer grid)."""
    base = f"""
    WITH edges AS (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey <> c_nationkey
    ),
    outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    pr0 AS (SELECT node, 1.0 / {n} AS r FROM nodes)"""
    for i in range(1, iters + 1):
        base += f""",
    pr{i} AS (
      SELECT nodes.node,
             round(1e-12 + {1 - d} / {n} + {d} * coalesce(m.mass, 0.0), 9) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(p.r / o.deg) AS mass
        FROM pr{i - 1} p JOIN edges e ON p.node = e.src JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst
      ) m ON nodes.node = m.node
    )"""
    base += f"""
    SELECT n_name, pr{iters}.r AS rank
    FROM pr{iters} JOIN nation ON node = n_nationkey
    ORDER BY rank DESC, n_name
    """
    return base


@register(
    "g01_pagerank",
    oracle=_pagerank_oracle_sql(),
    category="graph",
    doc=(
        "PageRank (d=0.85, 5 power iterations) over the nation-level trade "
        "graph (supplier nation → customer nation edges from the fact "
        "join). Each iteration is one join + one aggregation shuffled on "
        "node id; ranks snap to a 1e-9 grid per iteration so the float "
        "pipeline stays engine-deterministic. The 100-TB shape: edges are "
        "the reduced fact table, iterations reuse a checkpointed edge list "
        "— identical to the connected-components loop."
    ),
)
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, iters = 0.85, 5
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # reused every iteration: never recompute
    )
    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    with_deg = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_nodes = 25
    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("r"))
    for _ in range(iters):
        mass = (
            with_deg.join(ranks, with_deg.src == ranks.node)
            .select("dst", (F.col("r") / F.col("deg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(mass, nodes.node == mass.dst, "left_outer")
            .select(
                "node",
                F.round(
                    F.lit(1e-12)
                    + F.lit((1 - d) / n_nodes)
                    + F.lit(d) * F.coalesce(F.col("mass"), F.lit(0.0)),
                    9,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # truncate lineage each round
        )
    return (
        ranks.join(F.broadcast(nation), ranks.node == nation.n_nationkey)
        .select("n_name", F.col("r").alias("rank"))
        .orderBy(F.desc("rank"), F.asc("n_name"))
    )
