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
    # ONE aggregate over the materialized edge list feeds both the
    # broadcast decision (exact node count) and the first round's
    # checkpoint sizing (edge count). Round 12 (guide §1.2 — don't compute
    # things you throw away): the old shape ALSO built and eagerly
    # checkpointed a distinct node table here just so the label join after
    # the loop could read it — but the fixpoint star forest contains
    # exactly the original node set (every non-root as a child `u`, every
    # root as a `v`), so labels can be read straight off the final tiny
    # forest and the full-size node distinct+checkpoint disappears.
    head = e.select(F.explode(F.array("u", "v")).alias("n")).agg(
        F.countDistinct("n").alias("nn"), F.count(F.lit(1)).alias("e2")
    ).first()
    n_nodes, n_edges = int(head["nn"]), int(head["e2"]) // 2
    bcast = n_nodes <= broadcast_nodes_max

    def _nparts(n_rows: int) -> int:
        # tail rounds shrink the edge list by orders of magnitude; sizing
        # each round's checkpoint to its INPUT row count (conservative
        # upper bound on the output) keeps the per-round fixed cost from
        # being paid across spark.sql.shuffle.partitions near-empty
        # blocks/tasks (round 12 — same discipline as pagerank's node
        # cache; measured: the post-contraction rounds at sf0.1 run over
        # ~5k edges but paid 32-partition stages for every star op)
        return max(1, min(
            -(-n_rows // 250_000),
            edges.sparkSession.sparkContext.defaultParallelism,
        ))

    prev_stat = None
    n_in = n_edges
    for _ in range(max_iter):
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # eager localCheckpoint: materialize AND truncate lineage each round
        new_e = (
            _small_star(_large_star(sym, bcast), bcast)
            .coalesce(_nparts(n_in))
            .localCheckpoint(eager=True)
        )
        # one tiny action on the materialized frame: count + order-free hash
        # (bit_xor, not sum: ANSI mode throws on int64 sum overflow, and the
        # edge list is distinct so xor has no self-cancellation pairs)
        stat = new_e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        stat = (stat["n"], stat["h"])
        n_in = int(stat[0])
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

    # fixpoint is a disjoint star forest: (child, root) edges covering the
    # original node set — children are the non-root nodes, roots the
    # component minima. The final e MUST stay resident here (the caller
    # has not evaluated labels yet), so the NEXT invocation releases it
    # instead (ckpt.rotate_generation, round 12: bounded long-session
    # leak).
    from corintick_spark.operators.ckpt import rotate_generation

    rotate_generation("dup_clusters.connected_components", e)
    labels = e.select(
        F.col("u").alias("node"), F.col("v").alias("comp")
    ).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("comp")).distinct()
    )
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
