"""Distributed triangle enumeration over an undirected edge list.

The classic MPC/MapReduce formulation (Suri & Vassilvitskii, "Counting
Triangles and the Curse of the Last Reducer", WWW 2011 — public
knowledge): orient every undirected edge from its lower to its higher
endpoint in the TOTAL ORDER (degree, node), build wedges by self-joining
oriented edges on their source, and close each wedge with one more
equi-join. Degree orientation is the part that scales: every node's
out-degree is bounded by O(sqrt(m)) on real (power-law) graphs, so the
wedge join produces O(m^1.5) rows worst-case instead of sum(deg^2) —
the hub node that would explode an id-ordered orientation becomes a
wedge *target*, never a wedge *source*.

Output is orientation-independent: each triangle appears exactly once and
is emitted as its id-sorted triple, so an id-ordered SQL oracle matches
even though the physical join order here is degree-ordered.

Everything is equi-joins + one aggregation — no cross join, no driver
round-trips; the plan is three shuffles on node keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from corintick_spark.operators.ckpt import release_local_checkpoint


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate triangles of the undirected graph given as an edge list
    (duplicates / self-loops / reversed duplicates tolerated). Returns one
    row per triangle with columns (n1, n2, n3), id-sorted ascending."""
    # canonical undirected edge set
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    # total order key (degree, node): ties broken by id so the order is total
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.struct("deg", F.col("node").alias("n")).alias("ku"))
    dv = deg.select(F.col("node").alias("v"), F.struct("deg", F.col("node").alias("n")).alias("kv"))
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("ky"),
        )
    )

    # wedges from each low-order source; keep one ordering (b < c in the
    # total order) so each wedge — and hence each triangle — appears once
    a = oriented.select(F.col("x").alias("a"), F.col("y").alias("b"), F.col("ky").alias("kb"))
    b = oriented.select(F.col("x").alias("a"), F.col("y").alias("c"), F.col("ky").alias("kc"))
    wedges = a.join(b, "a").filter(F.col("kb") < F.col("kc")).select("a", "b", "c")

    closing = oriented.select(F.col("x").alias("b"), F.col("y").alias("c"))
    tri = wedges.join(closing, ["b", "c"])

    srt = F.array_sort(F.array("a", "b", "c"))
    return tri.select(
        srt.getItem(0).alias("n1"),
        srt.getItem(1).alias("n2"),
        srt.getItem(2).alias("n3"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_iter: int = 30,
    broadcast_frontier_max: int = 1_000_000,
) -> DataFrame:
    """Multi-source shortest-hop BFS: (node, hops) for every node reachable
    from `seeds` following edge direction, hops = length of the SHORTEST
    path (level-synchronous, so first discovery IS the minimum).

    Scale shape: each level is frontier ⋈ edges (equi-join on src) → new
    nodes anti-joined against the visited set. The frontier is broadcast
    while it stays under `broadcast_frontier_max` rows (the common case —
    frontiers are ≪ |V|), so the per-level cost is one pass over the edge
    partitions with NO edge shuffle; above the threshold it degrades to a
    plain shuffle join. The visited set grows monotonically and is
    localCheckpoint-ed per level to cut lineage (same segmenting discipline
    as pagerank/connected_components; at 100 TB the checkpoint would be a
    durable table swap). One `count()` action per level drives loop
    termination — that is the frontier-size scalar every distributed BFS
    needs, not a data collect.
    """
    visited = (
        seeds.select(F.col(node).cast("long").alias(node))
        .distinct()
        .select(node, F.lit(0).alias("hops"))
        .localCheckpoint()
    )
    # materialize the edge list ONCE before the loop (round 11): every
    # level joins against e, and without the checkpoint each level
    # re-executed the caller's entire edge DERIVATION (for the registered
    # graph_bfs that is a 3-table fact join + distinct, re-run per hop —
    # the same disease sql_recursive had). Same discipline as pagerank's
    # cached norm table.
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct().localCheckpoint(eager=True)
    frontier = visited
    frontier_rows = frontier.count()
    for level in range(1, max_iter + 1):
        f = frontier.select(F.col(node).alias("src"))
        if frontier_rows <= broadcast_frontier_max:
            f = F.broadcast(f)
        nxt = (
            e.join(f, "src")
            .select(F.col("dst").alias(node))
            .distinct()
            .join(visited.select(node), node, "left_anti")
            .select(node, F.lit(level).alias("hops"))
            .localCheckpoint()
        )
        frontier_rows = nxt.count()
        if frontier_rows == 0:
            break
        old = visited
        visited = visited.unionByName(nxt).localCheckpoint()
        # real block release per level (Dataset.unpersist is a no-op on
        # localCheckpointed frames — ckpt.py); the previous frontier is
        # also done once the new visited materialized, except at level 1
        # where it IS the old visited frame
        release_local_checkpoint(old)
        if frontier is not old:
            release_local_checkpoint(frontier)
        frontier = nxt
    # result-feeding frames (visited; final frontier == last nxt, whose
    # blocks visited's union consumed but which may be the level-0 frame
    # itself; the edge checkpoint) are released by the NEXT invocation
    # (ckpt.rotate_generation, round 12 — bounded long-session leak)
    from corintick_spark.operators.ckpt import rotate_generation

    rotate_generation("graph.bfs", visited, frontier, e)
    return visited
