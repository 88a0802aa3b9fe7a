"""Duplicate clustering: connected components over near-dup pair edges.

Pairwise near-dup detection (MinHash/SimHash/embedding) yields EDGES; a
training-data pipeline needs CLUSTERS (keep one doc per transitive group).
This is connected components via the alternating large-star/small-star
edge-rewriting algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): each round is two groupBy shuffles on
well-distributed node ids and converges in O(log n) rounds even on
high-diameter graphs (a path graph collapses exponentially fast, unlike
plain min-label propagation which needs O(diameter) rounds — verified by
the path-graph unit test in tests/test_operators.py).

Scale discipline for the driver loop:
- every iteration's edge frame is eagerly ``localCheckpoint``-ed and the
  previous one unpersisted: the convergence probe and the next round read
  the materialized blocks, and the logical plan is truncated each round
  (it otherwise doubles per round — by round ~10 Catalyst spends longer
  stringifying the plan than executing it);
- convergence is detected from a single tiny aggregate per round
  (edge count + order-independent xxhash64 fold), not a join against the
  previous labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from corintick_spark.operators.ckpt import release_local_checkpoint


def _large_star(sym: DataFrame, bcast: bool) -> DataFrame:
    """One large-star round over a symmetric directed edge list (u, v):
    connect every neighbor larger than the center to the neighborhood
    minimum m = min(Γ(u) ∪ {u}). Output edges are (larger, smaller).

    ``bcast``: broadcast the per-center minimum table into the edge join —
    m has at most |nodes| rows, so when the node set is small relative to
    the edge list (the common dedup-graph shape) this removes the edge-side
    shuffle of the round's heaviest join."""
    m = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = m.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
    if bcast:
        m = F.broadcast(m)
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(directed: DataFrame, bcast: bool) -> DataFrame:
    """One small-star round over edges already directed (larger, smaller):
    for each center u, connect u and all its smaller neighbors to the
    minimum of that set. Output stays directed (larger, smaller)."""
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    mj = F.broadcast(m) if bcast else m
    nbrs = directed.join(mj, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    centers = m.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.unionByName(centers).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    a: str = "a_id",
    b: str = "b_id",
    max_iter: int = 25,
    broadcast_nodes_max: int = 1_000_000,
) -> DataFrame:
    """Return (node, comp) where comp = min node id of the component.

    edges: undirected pair list (each edge once, any orientation). Node ids
    must be totally ordered (numeric or string). Converges in O(log n)
    alternating-star rounds; ``max_iter`` is a safety cap far above that.

    ``broadcast_nodes_max``: when the node count is at or below this, each
    star round's per-center minimum table (≤ |nodes| rows) is broadcast
    into its edge join instead of shuffled — AQE cannot infer that from a
    localCheckpointed frame (no size statistics). Above the threshold the
    shuffle path is the correct plan. The node count costs one aggregate
    over the already-checkpointed edge list, paid once before the loop.
    """
    raw = edges.select(F.col(a).alias("u"), F.col(b).alias("v")).filter(
        F.col("u") != F.col("v")
    )

    # canonical directed (larger, smaller) start state
    e = (
        raw.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
    ).localCheckpoint(eager=True)
    # nodes is checkpointed NOW from the materialized e — ids only, so the
    # blocks are small — because it is read again by the final label join
    # AFTER the loop. Deriving it lazily from `raw` (the round-6 shape)
    # re-ran the caller's ENTIRE edge-generation pipeline a second time at
    # label time: dedup_clusters' prefix-filter Jaccard join was ~35% of
    # the query at sf10 (measured round 7: 304s -> 160s from this line).
    # The same materialized frame answers the broadcast-decision count.
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bcast = nodes.count() <= broadcast_nodes_max
    prev_stat = None
    for _ in range(max_iter):
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # eager localCheckpoint: materialize AND truncate lineage each round
        new_e = _small_star(_large_star(sym, bcast), bcast).localCheckpoint(eager=True)
        # one tiny action on the materialized frame: count + order-free hash
        # (bit_xor, not sum: ANSI mode throws on int64 sum overflow, and the
        # edge list is distinct so xor has no self-cancellation pairs)
        stat = new_e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        stat = (stat["n"], stat["h"])
        # ACTUALLY free the previous round's checkpoint blocks now that
        # new_e is materialized. Dataset.unpersist() (the round-6 shape)
        # is a silent no-op on localCheckpointed frames; blocks piled up
        # one round at a time until repeated sf10 runs OOMed the JVM —
        # see operators/ckpt.py.
        release_local_checkpoint(e)
        e = new_e
        if stat == prev_stat:
            break
        prev_stat = stat

    # fixpoint is a disjoint star forest: (child, root) edges. The final
    # e and nodes MUST stay resident here — the caller has not evaluated
    # labels yet — so the NEXT invocation releases them instead
    # (ckpt.rotate_generation, round 12: bounded long-session leak).
    from corintick_spark.operators.ckpt import rotate_generation

    rotate_generation("dup_clusters.connected_components", e, nodes)
    labels = nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("_root")), "node", "left"
    ).select("node", F.coalesce(F.col("_root"), F.col("node")).alias("comp"))
    return labels


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "a_id",
    b: str = "b_id",
) -> DataFrame:
    """Cluster docs by transitive near-duplicate pairs; returns one row per
    document: (doc_id, cluster_id, is_keeper). Docs in no pair form
    singleton clusters. keeper = min doc_id of the cluster (the dedup
    survivor)."""
    comps = connected_components(pairs, a, b)
    clustered = docs.select(F.col(id_col)).join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    )
    out = clustered.withColumn(
        "cluster_id", F.coalesce(F.col("comp"), F.col(id_col))
    ).drop("comp")
    return out.withColumn(
        "is_keeper", (F.col("cluster_id") == F.col(id_col)).cast("boolean")
    )
