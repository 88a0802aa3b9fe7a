"""Graph analytics queries over the TPC-H purchase graph.

Extends the iterative-graph tier (graph_pagerank, dedup_clusters) with the
one-shot join-expressible graph operators — these DO have exact SQL
oracles, unlike the float-iterating PageRank. The derived graph is the
nation-level trade graph: nation A — nation B iff some customer in A
bought from some supplier in B. Node count is bounded (|nation|), but the
DERIVATION runs over the full lineitem fact table, so the heavy part of
the plan — the 4-way join + distinct — exercises real scale; the triangle
join itself is the textbook degree-oriented MPC shape that stays safe on
power-law graphs of any size (operators/graph.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.operators.graph import triangles
from corintick_spark.registry import query


def _trade_edges(spark, sf_dir):
    """Distinct nation-nation trade edges from the lineitem fact table.

    Join order matters at scale: lineitem ⋈ orders is the fact-fact shuffle
    join; customer/supplier/nation joins are broadcastable dims. The
    distinct collapses |lineitem| rows to at most |nation|^2 before any
    graph work happens."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )


# Triangle enumeration — the standard graph-cohesion primitive (clustering
# coefficient, community seeding). The Spark side orients edges by DEGREE
# (safe on hub-heavy graphs: wedge sources are always the low-degree
# endpoint); the oracle orients by id. Both enumerate each triangle exactly
# once and emit the id-sorted triple, so the outputs match even though the
# physical join shapes differ — that's the point: orientation is an
# execution-strategy choice, not a semantic one.
@query(
    "graph_triangles",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ), e AS (
        SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
    )
    SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangles(spark, sf_dir):
    """All triangles of the nation-level trade graph (id-sorted triples)."""
    return triangles(_trade_edges(spark, sf_dir), src="src", dst="dst")


# Per-node triangle participation + degree — the inputs to a local
# clustering coefficient. Same derivation, one extra explode + count; the
# coefficient itself is 2T/(d(d-1)), a pure float expression over exact
# integer counts, so both engines compute identical doubles.
@query(
    "graph_clustering_coeff",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ), e AS (
        SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
    ), tri AS (
        SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), tpn AS (
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT n1 AS node FROM tri
            UNION ALL SELECT n2 FROM tri
            UNION ALL SELECT n3 FROM tri
        ) GROUP BY node
    ), deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    )
    SELECT d.node, d.degree, COALESCE(t.n_triangles, 0) AS n_triangles,
           ROUND(CASE WHEN d.degree < 2 THEN 0.0
                      ELSE 2.0 * COALESCE(t.n_triangles, 0)
                           / (d.degree * (d.degree - 1)) END, 6) AS coeff
    FROM deg d LEFT JOIN tpn t ON d.node = t.node
    """,
)
def graph_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient per nation node: 2T / (d(d-1))."""
    edges = _trade_edges(spark, sf_dir)
    e = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    tri = triangles(edges, src="src", dst="dst")
    tpn = (
        tri.select(F.col("n1").alias("node"))
        .unionAll(tri.select(F.col("n2").alias("node")))
        .unionAll(tri.select(F.col("n3").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    coeff = (
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1))
        )
    )
    return (
        deg.join(tpn, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)))
        .select(
            "node", "degree", "n_triangles", F.round(coeff, 6).alias("coeff")
        )
    )


# Common-neighbor link prediction — "which non-adjacent nation pairs trade
# with the same partners?" Candidate pairs come from a self-join of the
# adjacency list ON THE SHARED NEIGHBOR (equi-join; never all-pairs), the
# existing-edge exclusion is an anti-join, and the Jaccard denominator
# uses |N(a)|+|N(b)|-common from precomputed degrees — three node-keyed
# shuffles total, the standard you-may-also-trade-with shape.
@query(
    "graph_link_predict",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ), e AS (
        SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
    ), adj AS (
        SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
        SELECT node, COUNT(*) AS d FROM adj GROUP BY node
    ), cand AS (
        SELECT x.node AS a, y.node AS b, COUNT(*) AS common
        FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        GROUP BY x.node, y.node
    ), nonedge AS (
        SELECT c.a, c.b, c.common FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b)
    )
    SELECT n.a, n.b, n.common,
           ROUND(CAST(n.common AS DOUBLE)
                 / (da.d + db.d - n.common), 6) AS jaccard
    FROM nonedge n
    JOIN deg da ON da.node = n.a
    JOIN deg db ON db.node = n.b
    """,
)
def graph_link_predict(spark, sf_dir):
    """Common-neighbor / Jaccard scores for non-adjacent nation pairs."""
    edges = _trade_edges(spark, sf_dir)
    e = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    x = adj.select(F.col("node").alias("a"), "nbr")
    y = adj.select(F.col("node").alias("b"), "nbr")
    cand = (
        x.join(y, "nbr")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    nonedge = cand.join(
        e, (cand.a == e.u) & (cand.b == e.v), "left_anti"
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    jac = F.col("common").cast("double") / (
        F.col("da") + F.col("db") - F.col("common")
    )
    return (
        nonedge.join(da, "a")
        .join(db, "b")
        .select("a", "b", "common", F.round(jac, 6).alias("jaccard"))
    )


# Multi-source BFS — shortest hop distance from the region-0 nations over
# a SPARSE directed trade graph (a 2-day shipdate slice keeps the nation
# graph multi-hop: depths reach 5 at sf0.01 instead of the dense slice's
# diameter-1 triviality). The Spark side is level-synchronous frontier
# expansion (operators/graph.py::bfs_hops — broadcast frontier, anti-join
# visited, per-level localCheckpoint); the oracle is the textbook
# recursive-CTE fixpoint with MIN(hops), so the driver adjudicates that
# first-discovery-level == shortest-path-length over every reachable node.
@query(
    "graph_bfs",
    sql="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey != s.s_nationkey
        AND l.l_shipdate >= TIMESTAMP '1996-06-01'
        AND l.l_shipdate <  TIMESTAMP '1996-06-03'
    ), seeds AS (
      SELECT n_nationkey AS node FROM nation WHERE n_regionkey = 0
    ), walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hops < 25
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY node ORDER BY node
    """,
)
def graph_bfs(spark, sf_dir):
    """Shortest hops from region-0 nations over the sparse trade graph."""
    from corintick_spark.operators.graph import bfs_hops

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-03").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
    )
    seeds = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("node"))
    )
    return (
        bfs_hops(edges, seeds)
        .select("node", F.col("hops").cast("int").alias("hops"))
        .orderBy("node")
    )
