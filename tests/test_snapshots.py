"""SnapshotStore: snapshot isolation, time travel, optimistic concurrency,
crash invisibility, and GC semantics (corintick_spark/snapshots.py)."""

from __future__ import annotations

import json
import os

import pytest

from corintick_spark.snapshots import ConcurrentCommitError, SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_append_and_time_travel(store, spark):
    v0 = store.append(_df(spark, 0, 100))
    v1 = store.append(_df(spark, 100, 150))
    assert (v0, v1) == (0, 1)
    assert store.read(version=0).count() == 100
    assert store.read(version=1).count() == 150
    assert store.read().count() == 150
    hist = store.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["n_rows"] == 100 and hist[1]["n_rows"] == 150
    assert all(h["operation"] == "append" for h in hist)


def test_overwrite_keeps_old_snapshot_readable(store, spark):
    store.append(_df(spark, 0, 50))
    store.overwrite(_df(spark, 0, 10))
    assert store.read().count() == 10
    assert store.read(version=0).count() == 50  # time travel past overwrite


def test_compact_preserves_rows_and_old_version(store, spark):
    store.append(_df(spark, 0, 40))
    store.append(_df(spark, 40, 80))
    v = store.compact(target_partitions=1)
    assert v == 2
    assert store.manifest(2)["operation"] == "compact"
    assert len(store.manifest(2)["files"]) == 1
    assert sorted(r.k for r in store.read().collect()) == list(range(80))
    # reader pinned to v1 unaffected by the rewrite
    assert store.read(version=1).count() == 80


def test_crashed_writer_files_are_invisible(store, spark):
    store.append(_df(spark, 0, 20))
    # simulate a crash: stage data files but never commit a manifest
    orphan_dir = os.path.join(store.root, "data", "deadbeefcrash")
    _df(spark, 1000, 1100).write.parquet(orphan_dir)
    assert store.read().count() == 20  # orphans gated out by the manifest
    removed = store.vacuum_orphans()
    assert removed >= 1
    assert store.read().count() == 20


def test_concurrent_commit_loses_cleanly(store, spark):
    store.append(_df(spark, 0, 10))
    # writer A reads base=0 and stages its files...
    base_a = store.latest_version()
    files_a = store._stage_files(_df(spark, 10, 20))
    # ...then writer B commits v1 in the meantime
    store.append(_df(spark, 100, 110))
    # A's commit on the stale base must fail, never clobber B's snapshot
    with pytest.raises(ConcurrentCommitError):
        store._commit(
            store.manifest(base_a)["files"] + files_a, "append", base_a
        )
    assert store.read(version=1).count() == 20  # B's snapshot intact
    # retry on the refreshed base succeeds
    base = store.latest_version()
    v = store._commit(store.manifest(base)["files"] + files_a, "append", base)
    assert v == 2 and store.read().count() == 30


def test_expire_snapshots_gc(store, spark):
    store.append(_df(spark, 0, 30))
    store.overwrite(_df(spark, 0, 5))
    n_files_before = sum(
        len(files)
        for _, _, files in os.walk(os.path.join(store.root, "data"))
    )
    expired = store.expire_snapshots(keep_last=1)
    assert expired == [0]
    assert store.versions() == [1]
    assert store.read().count() == 5
    n_files_after = sum(
        len(files)
        for _, _, files in os.walk(os.path.join(store.root, "data"))
    )
    assert n_files_after < n_files_before  # v0's files reclaimed
    with pytest.raises(FileNotFoundError):
        store.manifest(0)
