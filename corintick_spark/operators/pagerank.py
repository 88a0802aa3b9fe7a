"""Weighted PageRank: power iteration over a distributed edge list.

The iterative-algorithms tier beyond connected components
(operators/dup_clusters.py): importance propagation over a graph too large
for one machine — link graphs for crawl prioritization, citation graphs for
document weighting in a training-data pipeline. corintick had no graph tier
(SURVEY.md §2.1 — client-side pandas †); this is the standard Pregel-shaped
formulation as plain DataFrame ops.

Scale discipline (the same rules as the connected-components driver loop):

- the normalized edge list is partitioned by ``src`` ONCE, cached, and
  reused every iteration — only the small (node, rank) table moves through
  a shuffle per round;
- each iteration's rank frame is eagerly ``localCheckpoint``-ed and the
  previous one unpersisted, truncating the logical plan (it otherwise
  doubles per round);
- dangling mass (nodes with no out-edges) is redistributed uniformly via
  one tiny scalar aggregate per round — no driver-side collect of ranks.

Float caveat: per-destination contribution sums are float and therefore
order-dependent in the last ulps; ranks are deterministic to ~1e-12 but not
bit-stable, so the registry entry is rows-only (the differential unit test
checks against a dense numpy power iteration at 1e-9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Return (node, rank) after ``iterations`` rounds of weighted PageRank.

    edges: directed (src, dst[, weight]) list; parallel edges are merged by
    summing weights. Unweighted edges get weight 1. Ranks sum to 1 (dangling
    mass redistributed uniformly each round).
    """
    w = F.col(weight) if weight else F.lit(1.0)
    # cached: out_w, norm, nodes, and the dangling probe all derive from e —
    # without this the (possibly expensive) upstream edge construction
    # re-executes once per derived frame before the loop even starts
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .filter(F.col("w") > 0)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .cache()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge weight as out-fraction, partitioned by src once and reused —
    # every iteration's join then co-locates on the cached partitioning
    norm = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .repartition("src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()  # one scalar, fixed for the whole run
    if n_nodes == 0:  # empty graph: empty result, not a ZeroDivisionError
        norm.unpersist()
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))

    # dangling nodes (no out-edges) are a static property of the graph —
    # detect ONCE; graphs without them (e.g. symmetrized edges) skip the
    # per-iteration dangling-mass job entirely (it was 8 of 16 driver
    # actions and half the wall-clock of the bipartite purchase graph)
    dangling_nodes = nodes.join(
        out_w, nodes.node == out_w.src, "left_anti"
    ).cache()
    has_dangling = bool(dangling_nodes.head(1))

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("contrib"))
        )
        # dangling mass: rank sitting on nodes with no out-edges this round
        dangling = (
            ranks.join(
                dangling_nodes.select(F.col("node").alias("_dn")),
                ranks.node == F.col("_dn"),
                "left_semi",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
            if has_dangling
            else 0.0
        )
        new_ranks = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n_nodes))
            ).alias("rank"),
        )
        prev = ranks
        ranks = new_ranks.localCheckpoint(eager=True)
        prev.unpersist()
    e.unpersist()
    return ranks
