"""Streaming graph-ANN ingest (streaming/graph_ingest.py): the foreachBatch
fold that grows a persisted GraphIndex from a vector stream.

Pins the store contract the module documents: latest-epoch-wins graph
reads, append-only vectors, warm start from a ``GraphIndex.save`` dir,
retry idempotency (epoch-keyed overwrite + prior-epoch-excluded reads),
compaction transparency, and end-to-end recall of the stream-grown index
against the exact scan.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from corintick_spark.operators.ann_index import GraphIndex
from corintick_spark.operators.similarity import brute_force_topk
from corintick_spark.streaming.graph_ingest import (
    compact_graph_store,
    load_stream_index,
    make_graph_batch_processor,
    read_graph_store,
    streaming_graph_ingest,
)
from corintick_spark.streaming.incremental_dedup import frame_stream_batched


def _clustered_pdf(n_clusters=20, per_cluster=12, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3.0
    rows = []
    for c in centers:
        for _ in range(per_cluster):
            rows.append((len(rows), (c + rng.randn(dim) * 0.3).tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_clustered_pdf()).cache()
    df.count()
    return df


def _graph_sane(g: pd.DataFrame, k: int) -> None:
    by_id = g.groupby("id")
    assert (by_id.size() <= k).all()
    assert (by_id["nbr"].nunique() == by_id.size()).all()
    assert (g["id"] != g["nbr"]).all()


def test_cold_start_stream_recall(spark, corpus):
    src = frame_stream_batched(spark, corpus, n_batches=3, order_col="vec_id")
    idx = streaming_graph_ingest(spark, src, k=8, sample_size=64)
    assert idx.vectors.count() == corpus.count()
    _graph_sane(idx.graph.toPandas(), k=8)
    probes = corpus.filter(F.col("vec_id") < 12)
    out = idx.search(probes, k=5, beam=12, sample_size=64)
    exact = brute_force_topk(probes, corpus, k=5, max_broadcast_rows=None)
    hit = out.join(exact.select("q_id", "c_id"), ["q_id", "c_id"]).count()
    assert hit / exact.count() >= 0.85


def test_warm_start_from_saved_index(spark, corpus, tmp_path):
    """A GraphIndex.save dir IS a valid store root: its root-level part
    files read as epoch -1 and the stream's epochs build on top."""
    old = corpus.filter(F.col("vec_id") % 3 != 0)
    newer = corpus.filter(F.col("vec_id") % 3 == 0)
    store = str(tmp_path / "store")
    GraphIndex.build(old, k=6, iters=3).save(store)
    src = frame_stream_batched(spark, newer, n_batches=2, order_col="vec_id")
    idx = streaming_graph_ingest(spark, src, store_path=store, k=6,
                                 sample_size=64)
    assert idx.vectors.count() == corpus.count()
    g = idx.graph.toPandas()
    _graph_sane(g, k=6)
    # every streamed-in vector is wired into the merged graph
    new_ids = {r.vec_id for r in newer.select("vec_id").collect()}
    assert new_ids <= set(g["id"])
    probes = newer.filter(F.col("vec_id") < 30)
    out = idx.search(probes, k=5, beam=12, sample_size=64)
    exact = brute_force_topk(probes, corpus, k=5, max_broadcast_rows=None)
    hit = out.join(exact.select("q_id", "c_id"), ["q_id", "c_id"]).count()
    assert hit / exact.count() >= 0.8


def test_retry_idempotent_and_latest_wins(spark, corpus, tmp_path):
    """Driving the processor directly: a retried epoch replaces its own
    output byte-for-row, and a later epoch's replace-set supersedes the
    touched ids' earlier lists in the merged read."""
    store = str(tmp_path / "store")
    proc = make_graph_batch_processor(spark, store, k=6, sample_size=64)
    b0 = corpus.filter(F.col("vec_id") < 120)
    b1 = corpus.filter(F.col("vec_id") >= 120)
    proc(b0, 0)
    g_after0 = read_graph_store(spark, store).toPandas()
    proc(b1, 1)
    merged = read_graph_store(spark, store).toPandas()
    key = lambda d: d.sort_values(["id", "nbr"]).reset_index(drop=True)[
        ["id", "nbr"]
    ]
    # retry epoch 1: the merged view is unchanged
    proc(b1, 1)
    merged_retry = read_graph_store(spark, store).toPandas()
    pd.testing.assert_frame_equal(key(merged), key(merged_retry))
    _graph_sane(merged, k=6)
    # latest-wins: epoch 1 rewrote SOME epoch-0 ids (reverse edges), and
    # for those ids the merged lists differ from the epoch-0 lists while
    # non-rewritten ids carry epoch-0 lists verbatim
    ep1_dir = os.path.join(store, "graph", "b1")
    ep1 = spark.read.parquet(ep1_dir).toPandas()
    rewrote_old = set(ep1["id"]) & set(g_after0["id"])
    assert rewrote_old, "epoch 1 should touch at least one epoch-0 node"
    untouched = set(g_after0["id"]) - set(ep1["id"])
    pd.testing.assert_frame_equal(
        key(merged[merged["id"].isin(untouched)]),
        key(g_after0[g_after0["id"].isin(untouched)]),
    )
    # the epoch-1 lists are what the merged view serves for rewritten ids
    pd.testing.assert_frame_equal(
        key(merged[merged["id"].isin(rewrote_old)]),
        key(ep1[ep1["id"].isin(rewrote_old)]),
    )


def test_compaction_preserves_view(spark, corpus, tmp_path):
    store = str(tmp_path / "store")
    proc = make_graph_batch_processor(spark, store, k=6, sample_size=64)
    proc(corpus.filter(F.col("vec_id") < 120), 0)
    proc(corpus.filter(F.col("vec_id") >= 120), 1)
    before = read_graph_store(spark, store).toPandas()
    compact_graph_store(spark, store)
    # epoch dirs folded away, view identical, further loads work
    assert not any(
        n.startswith("b") and n[1:].isdigit()
        for n in os.listdir(os.path.join(store, "graph"))
    )
    after = read_graph_store(spark, store).toPandas()
    key = lambda d: d.sort_values(["id", "nbr"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(before), key(after))
    idx = load_stream_index(spark, store, k=6)
    assert idx.vectors.count() == corpus.count()
    # a post-compaction epoch still supersedes compacted rows
    proc(
        spark.createDataFrame(
            _clustered_pdf(n_clusters=2, per_cluster=6, seed=9).assign(
                vec_id=lambda d: d.vec_id + 10_000
            )
        ),
        2,
    )
    g = read_graph_store(spark, store).toPandas()
    _graph_sane(g, k=6)
    assert (g["id"] >= 10_000).sum() > 0
