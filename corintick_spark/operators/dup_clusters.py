"""Duplicate clustering: connected components over near-dup pair edges.

Pairwise near-dup detection (MinHash/SimHash/embedding) yields EDGES; a
training-data pipeline needs CLUSTERS (keep one doc per transitive group).
This is connected components via alternating large-star/small-star label
propagation (the map-reduce CC algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond"): every iteration is two groupBy
shuffles on well-distributed ids, converging in O(log n) iterations —
no graph library, plain DataFrame ops.

The driver loop checks a convergence aggregate per iteration (a count, not
data) — the same driver-loop-with-distributed-steps shape as k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a_id",
    b: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    edges: undirected pair list (each edge once, any orientation).
    """
    # symmetrize once; labels start as each node's own id
    sym = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )

    for _ in range(max_iter):
        # propagate: each node takes min(own comp, neighbors' comps)
        with_nbr = (
            sym.join(labels.withColumnRenamed("node", "u").withColumnRenamed("comp", "u_comp"), "u")
            .join(labels.withColumnRenamed("node", "v").withColumnRenamed("comp", "v_comp"), "v")
        )
        new_labels = (
            with_nbr.select(F.col("u").alias("node"), F.least("u_comp", "v_comp").alias("comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # convergence: no label changed
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
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
