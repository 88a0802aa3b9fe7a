"""Streaming graph-ANN ingest: a vector stream folded into a growing
persisted GraphIndex (round 11 — the live-ingest face of
operators/ann_index.py::GraphIndex, mirroring incremental_dedup.py's
signature-store fold).

A production embedding pipeline does not rebuild its ANN index per day; it
INSERTS each arriving batch. Batch-side that is ``GraphIndex.insert``
(search-and-connect, corpus never re-scored); this module closes the loop
for Structured Streaming: ``foreachBatch`` computes the insertion's
REPLACE-SET (``GraphIndex.insert_delta`` — complete post-insert adjacency
lists for the batch ids + the touched corpus nodes) and commits it to an
epoch subdir, so the store grows by O(|batch|·k) rows per epoch and the
untouched corpus adjacency is never rewritten.

Store layout (rooted at ``store_path``, compatible with
``GraphIndex.save`` output for warm starts)::

    graph/    part-*.parquet   root-level files: warm-start / compacted
              b{N}/            epoch N's replace-set (id, nbr, score, epoch)
    vectors/  part-*.parquet   warm-start prepped vectors (id, vec, n2)
              b{N}/            epoch N's new vectors

Reads resolve the graph LATEST-EPOCH-WINS per id (root-level rows are
epoch -1): an id's adjacency list is the one written by the highest epoch
that wrote it. That is merge-on-read, exactly what a table format's
upsert gives you; ``compact_graph_store`` folds the epochs back into
root-level files when the tail grows long. At cluster scale the store is
an id-bucketed table, so latest-wins resolves within buckets without a
global shuffle and the per-hop search joins stay co-located; on local[N]
the per-read window over id is the honest equivalent.

Exactly-once under retries: epochs commit with mode=overwrite to their
own ``b{N}`` dir and every read EXCLUDES the current epoch
(``_store_epoch_paths``), so a retried micro-batch recomputes the same
delta from the same prior state and replaces its own partial output —
the same contract incremental_dedup.py and sources/stream_sink.py pin.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from corintick_spark.operators.ann_index import GraphIndex
from corintick_spark.streaming.incremental_dedup import (
    _cleanup_at_exit,
    _store_epoch_paths,
)


def _read_epochs(spark: SparkSession, root: str, batch_id: int) -> "DataFrame | None":
    """Union of the root-level files + all epoch dirs strictly before
    ``batch_id`` (sys.maxsize-like sentinel for "all": pass a huge id),
    with a missing ``epoch`` column (warm-start rows) filled as -1."""
    paths = _store_epoch_paths(root, batch_id)
    if not paths:
        return None
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if "epoch" not in df.columns:
        df = df.withColumn("epoch", F.lit(-1).cast("int"))
    return df.withColumn(
        "epoch", F.coalesce(F.col("epoch"), F.lit(-1)).cast("int")
    )


def read_graph_store(
    spark: SparkSession, store_path: str, upto: int = 1 << 60
) -> "DataFrame | None":
    """The current graph as (id, nbr, score): latest-epoch-wins per id
    over root files + epoch dirs < ``upto``."""
    g = _read_epochs(spark, os.path.join(store_path, "graph"), upto)
    if g is None:
        return None
    w = Window.partitionBy("id")
    return (
        g.withColumn("_mx", F.max("epoch").over(w))
        .filter(F.col("epoch") == F.col("_mx"))
        .select("id", "nbr", "score")
    )


def read_vector_store(
    spark: SparkSession, store_path: str, upto: int = 1 << 60
) -> "DataFrame | None":
    """The current prepped vectors as (id, vec, n2) — pure append across
    epochs (ids are unique by the insert contract)."""
    v = _read_epochs(spark, os.path.join(store_path, "vectors"), upto)
    return None if v is None else v.select("id", "vec", "n2")


def load_stream_index(
    spark: SparkSession, store_path: str, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> GraphIndex:
    """A GraphIndex view over the stream-grown store (no data movement —
    the latest-wins resolution is part of the returned plan)."""
    g = read_graph_store(spark, store_path)
    v = read_vector_store(spark, store_path)
    if g is None or v is None:
        raise FileNotFoundError(f"empty graph store at {store_path}")
    return GraphIndex(g, v, k, id_col, vec_col)


def make_graph_batch_processor(
    spark: SparkSession,
    store_path: str,
    k: int = 10,
    build_iters: int = 3,
    beam: int = 15,
    hops: int = 3,
    sample_size: int = 128,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the foreachBatch fold callback. Module-level (not a closure
    of the stream runner) so tests can drive it directly with repeated
    batch_ids — retry idempotency is part of the API.

    Epoch 0 against an empty store falls back to ``GraphIndex.build``
    over the batch (cold start); every other epoch is
    ``insert_delta`` against the prior epochs' merged view."""
    graph_root = os.path.join(store_path, "graph")
    vec_root = os.path.join(store_path, "vectors")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prior_g = read_graph_store(spark, store_path, upto=batch_id)
        prior_v = read_vector_store(spark, store_path, upto=batch_id)
        if prior_g is None or prior_v is None:
            built = GraphIndex.build(
                batch_df, k=k, iters=build_iters, seed=seed,
                id_col=id_col, vec_col=vec_col,
            )
            delta_graph, new_vecs = built.graph, built.vectors
        else:
            idx = GraphIndex(prior_g, prior_v, k, id_col, vec_col)
            delta_graph, new_vecs, _ = idx.insert_delta(
                batch_df, beam=beam, hops=hops,
                sample_size=sample_size, seed=seed,
            )
        ep = F.lit(batch_id).cast("int")
        delta_graph.withColumn("epoch", ep).write.mode("overwrite").parquet(
            os.path.join(graph_root, f"b{batch_id}")
        )
        new_vecs.withColumn("epoch", ep).write.mode("overwrite").parquet(
            os.path.join(vec_root, f"b{batch_id}")
        )

    return _process


def streaming_graph_ingest(
    spark: SparkSession,
    vec_stream: DataFrame,
    store_path: "str | None" = None,
    k: int = 10,
    build_iters: int = 3,
    beam: int = 15,
    hops: int = 3,
    sample_size: int = 128,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> GraphIndex:
    """Run a vector stream to quiescence through the graph-ingest fold and
    return the GraphIndex over the grown store.

    ``store_path`` may be a prior ``GraphIndex.save`` directory (warm
    start: the saved graph/vectors are epoch -1); defaults to a fresh
    temp dir (cold start: epoch 0 builds from the first batch)."""
    work = tempfile.mkdtemp(prefix="graphingest_")
    _cleanup_at_exit(work)
    if store_path is None:
        store_path = os.path.join(work, "store")
    _process = make_graph_batch_processor(
        spark, store_path, k=k, build_iters=build_iters, beam=beam,
        hops=hops, sample_size=sample_size, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    ckpt = os.path.join(work, "ckpt")
    q = (
        vec_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName("graphingest_" + uuid.uuid4().hex[:8])
        .start()
    )
    q.awaitTermination()
    return load_stream_index(spark, store_path, k, id_col, vec_col)


def compact_graph_store(spark: SparkSession, store_path: str) -> None:
    """Fold the epoch tail back into root-level files (the maintenance a
    table format's OPTIMIZE does transactionally; local best-effort here):
    materialize latest-wins for the graph and the appended vectors, then
    replace the store contents. Subsequent epochs keep superseding the
    compacted rows — compaction preserves each id's winning epoch number."""
    for root, reader in (
        (os.path.join(store_path, "graph"), read_graph_store),
        (os.path.join(store_path, "vectors"), read_vector_store),
    ):
        cur = _read_epochs(spark, root, 1 << 60)
        if cur is None:
            continue
        if reader is read_graph_store:
            w = Window.partitionBy("id")
            cur = (
                cur.withColumn("_mx", F.max("epoch").over(w))
                .filter(F.col("epoch") == F.col("_mx"))
                .drop("_mx")
            )
        tmp = root + "_compacting"
        cur.repartition("id").write.mode("overwrite").parquet(tmp)
        shutil.rmtree(root)
        os.replace(tmp, root)
        # Spark wrote a directory; the reader treats epoch-dir-less part
        # files inside it via recursive listing only when they sit at the
        # store root — flatten them up one level.
        for name in os.listdir(root):
            if name.startswith("b") and name[1:].isdigit():
                raise RuntimeError("compaction produced an epoch dir")
