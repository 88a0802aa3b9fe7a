"""NN-Descent k-NN graph + batched graph search (operators/nndescent.py).

Pins the two measured failure modes that shaped the implementation:

- a SINGLE hash-bucketing init produces a disjoint union of bucket
  cliques — neighbor-of-neighbor never leaves the bucket, so descent is
  frozen at the init recall forever (test_single_bucket_init_is_trapped);
- a k-NN graph over clustered data is a disjoint union of CLUSTER
  cliques — a search seeded from shared random entry points only succeeds
  when an entry lands in the probe's cluster, so per-probe best-of-sample
  seeding is mandatory (test_search_seeding_required).

Plus the approximation-quality bar on the algorithm's home regime
(clustered corpora: recall ≥ 0.9), structural invariants, determinism,
and zero-norm handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from corintick_spark.operators.nndescent import graph_search, knn_graph
from corintick_spark.operators.similarity import brute_force_topk


def _clustered_pdf(n_clusters=30, per_cluster=10, dim=24, noise=0.3, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3.0
    rows = []
    for c in centers:
        for _ in range(per_cluster):
            rows.append((len(rows), (c + rng.randn(dim) * noise).tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def clustered(spark):
    df = spark.createDataFrame(_clustered_pdf())
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def exact5(spark, clustered):
    ex = brute_force_topk(clustered, clustered, k=5, max_broadcast_rows=None)
    ex = ex.select(
        F.col("q_id").alias("id"), F.col("c_id").alias("nbr")
    ).cache()
    ex.count()
    return ex


def _recall(graph, exact):
    tot = exact.count()
    hit = graph.join(exact, ["id", "nbr"]).count()
    return hit / tot


def test_clustered_recall(clustered, exact5):
    g = knn_graph(clustered, k=5, iters=4, build_k=10)
    assert _recall(g, exact5) >= 0.9


def test_structure_and_scores(spark, clustered):
    g = knn_graph(clustered, k=5, iters=2, build_k=8).cache()
    pdf = g.toPandas()
    # ≤ k distinct neighbors per node, no self-edges, contiguous ranks
    by_id = pdf.groupby("id")
    assert (by_id["nbr"].nunique() == by_id.size()).all()
    assert (by_id.size() <= 5).all()
    assert (pdf["id"] != pdf["nbr"]).all()
    assert all(
        sorted(sub["rank"]) == list(range(1, len(sub) + 1))
        for _, sub in by_id
    )
    # scores are the real cosine of the pair (6dp)
    vec = {r.vec_id: np.array(r.embedding) for r in clustered.collect()}
    for row in pdf.sample(n=25, random_state=0).itertuples():
        a, b = vec[row.id], vec[row.nbr]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(row.score - round(want, 6)) < 1e-9


def test_deterministic(clustered):
    a = knn_graph(clustered, k=5, iters=2, build_k=8).toPandas()
    b = knn_graph(clustered, k=5, iters=2, build_k=8).toPandas()
    key = lambda d: d.sort_values(["id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))


def test_single_bucket_init_is_trapped(clustered, exact5):
    """init_rounds=1 makes disjoint bucket cliques: descent cannot beat
    its own init (the measured bug the expander init fixed). Guard that
    the shipped default stays strictly better."""
    frozen = knn_graph(
        clustered, k=5, iters=4, build_k=10, init_rounds=1, bucket_factor=1
    )
    healthy = knn_graph(
        clustered, k=5, iters=4, build_k=10, init_rounds=3, bucket_factor=1
    )
    assert _recall(healthy, exact5) > _recall(frozen, exact5) + 0.2


def test_search_recall_and_shape(spark, clustered, exact5):
    g = knn_graph(clustered, k=8, iters=3, build_k=8)
    probes = clustered.filter(F.col("vec_id") < 12)
    out = graph_search(
        probes, g, clustered, k=5, beam=12, hops=3, sample_size=64
    ).cache()
    pdf = out.toPandas()
    assert set(pdf["q_id"]) == set(range(12))
    assert (pdf.groupby("q_id").size() == 5).all()
    assert (pdf["q_id"] != pdf["c_id"]).all()
    exp = exact5.filter(F.col("id") < 12).select(
        F.col("id").alias("q_id"), F.col("nbr").alias("c_id")
    )
    hit = out.join(exp, ["q_id", "c_id"]).count()
    assert hit / exp.count() >= 0.9


def test_search_seeding_required(clustered):
    """With a tiny shared sample (sample_size == entries, i.e. no
    per-probe selection pressure) most probes start outside their
    cluster and the clique-structured graph cannot route them in; the
    full sample must clearly beat it. Documents WHY best-of-sample
    seeding exists rather than a nicety."""
    g = knn_graph(clustered, k=8, iters=3, build_k=8)
    probes = clustered.filter(F.col("vec_id") < 12)
    ex = brute_force_topk(probes, clustered, k=5, max_broadcast_rows=None)
    exp = ex.select("q_id", "c_id").cache()
    tot = exp.count()

    def rec(sample_size):
        out = graph_search(
            probes, g, clustered, k=5, beam=12, hops=3,
            sample_size=sample_size,
        )
        return out.join(exp, ["q_id", "c_id"]).count() / tot

    assert rec(128) >= rec(4) + 0.3


def test_zero_norm_never_pairs(spark):
    pdf = _clustered_pdf(n_clusters=6, per_cluster=6, dim=8)
    pdf.at[0, "embedding"] = [0.0] * 8  # zero vector, vec_id 0
    df = spark.createDataFrame(pdf)
    g = knn_graph(df, k=3, iters=2, build_k=4).toPandas()
    assert 0 not in set(g["nbr"])  # nobody's neighbor
    assert 0 not in set(g["id"])  # no scorable edges of its own


def test_empty_corpus(spark):
    e = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert knn_graph(e, k=3, iters=1).count() == 0


def test_graph_index_lifecycle(spark, clustered, tmp_path):
    from corintick_spark.operators.ann_index import GraphIndex

    idx = GraphIndex.build(clustered, k=8, iters=3, build_k=8)
    path = str(tmp_path / "gidx")
    idx.save(path)
    idx2 = GraphIndex.load(spark, path)
    assert idx2.k == 8
    probes = clustered.filter(F.col("vec_id") < 10)
    out = idx2.search(probes, k=5, beam=12, sample_size=64).cache()
    assert (out.groupBy("q_id").count().toPandas()["count"] == 5).all()
    exact = brute_force_topk(probes, clustered, k=5, max_broadcast_rows=None)
    hit = out.join(exact.select("q_id", "c_id"), ["q_id", "c_id"]).count()
    assert hit / exact.count() >= 0.9


def test_graph_index_insert(spark, tmp_path):
    from corintick_spark.operators.ann_index import GraphIndex

    pdf = _clustered_pdf(n_clusters=20, per_cluster=12, dim=16, seed=11)
    full = spark.createDataFrame(pdf).cache()
    corpus = full.filter(F.col("vec_id") % 5 != 0).cache()
    batch = full.filter(F.col("vec_id") % 5 == 0).cache()

    idx = GraphIndex.build(corpus, k=6, iters=3, build_k=8)
    idx2 = idx.insert(batch, sample_size=64)

    g = idx2.graph.cache().toPandas()
    # structure survives: ≤ k distinct neighbors, no self edges
    by_id = g.groupby("id")
    assert (by_id.size() <= 6).all()
    assert (by_id["nbr"].nunique() == by_id.size()).all()
    assert (g["id"] != g["nbr"]).all()
    # every inserted vector is wired in (has forward edges)
    batch_ids = set(pdf[pdf.vec_id % 5 == 0]["vec_id"])
    assert batch_ids <= set(g["id"])
    # vectors table grew to the full corpus
    assert idx2.vectors.count() == full.count()
    # searching the merged index finds the batch's true neighbors
    probes = batch.filter(F.col("vec_id") < 50)
    out = idx2.search(probes, k=5, beam=12, sample_size=64)
    exact = brute_force_topk(probes, full, k=5, max_broadcast_rows=None)
    hit = out.join(exact.select("q_id", "c_id"), ["q_id", "c_id"]).count()
    assert hit / exact.count() >= 0.85
    # untouched corpus nodes kept their original lists verbatim
    touched = set(
        r.id for r in idx.graph.join(
            idx2.graph.filter(F.col("nbr").isin(list(batch_ids))).select("id").distinct(),
            "id", "left_semi").select("id").distinct().collect()
    )
    old = idx.graph.toPandas()
    new_old_part = g[~g["id"].isin(batch_ids) & ~g["id"].isin(touched)]
    old_untouched = old[~old["id"].isin(touched)]
    key = lambda d: d.sort_values(["id", "nbr"]).reset_index(drop=True)[["id", "nbr"]]
    pd.testing.assert_frame_equal(key(new_old_part), key(old_untouched))
