"""Deletion vectors (merge-on-read DELETE) on SnapshotStore
(corintick_spark/snapshots.py::delete_where_dv / purge_dv / _apply_dvs).

The contract under test, in the shape the public formats converged on
(Iceberg position deletes / Delta deletion vectors):
- a DV delete changes NO data files (zero write amplification);
- every read path (read, read_where, read_where_eq, time travel,
  merge/delete touched-file scans) subtracts the recorded positions;
- changes() resolves dv deltas to exact rows (CDC sees MoR deletes,
  and a restore that drops dv entries re-inserts the rows);
- purge_dv materializes the deletes copy-on-write;
- GC treats DV files as live while any manifest references them.
"""

from __future__ import annotations

import os

import pytest

from corintick_spark.snapshots import SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _ks(df):
    return sorted(r.k for r in df.collect())


def test_dv_delete_changes_no_data_files(store, spark):
    v0 = store.append(_df(spark, 0, 100).repartition(4))
    v1 = store.delete_where_dv("k % 10 = 0")
    m0, m1 = store.manifest(v0), store.manifest(v1)
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m0["files"]]
    assert m1["operation"] == "delete-dv"
    assert sum(e["rows"] for e in m1["dvs"]) == 10
    assert _ks(store.read()) == [k for k in range(100) if k % 10 != 0]
    # time travel still sees the pre-delete rows
    assert _ks(store.read(version=v0)) == list(range(100))
    assert store.history()[-1]["n_dv_deleted"] == 10


def test_second_dv_delete_accumulates_without_double_count(store, spark):
    store.append(_df(spark, 0, 50))
    store.delete_where_dv("k < 10")
    # overlapping predicate: k<10 already gone, only 10..19 newly recorded
    v2 = store.delete_where_dv("k < 20")
    dv_rows = sum(e["rows"] for e in store.manifest(v2)["dvs"])
    assert dv_rows == 20  # 10 + 10, no re-recorded positions
    assert _ks(store.read()) == list(range(20, 50))


def test_dv_delete_with_stats_pruning(store, spark):
    store.append(_df(spark, 0, 1000).repartitionByRange(4, "k"))
    v = store.delete_where_dv("k BETWEEN 0 AND 99", prune=("k", 0, 99))
    # only the file(s) covering [0, 99] were even scanned — the positions
    # can only reference those; correctness is the visible contract
    assert _ks(store.read()) == list(range(100, 1000))
    assert store.manifest(v)["dvs"]


def test_read_where_and_point_lookup_apply_dvs(store, spark):
    store.append(_df(spark, 0, 100).repartitionByRange(4, "k"))
    store.delete_where_dv("k % 2 = 0")
    got = _ks(store.read_where("k", 10, 20))
    assert got == [11, 13, 15, 17, 19]
    store.index_bloom(["k"])
    assert store.read_where_eq("k", 13).count() == 1
    assert store.read_where_eq("k", 14).count() == 0  # dv-deleted


def test_purge_dv_materializes(store, spark):
    store.append(_df(spark, 0, 60).repartition(3))
    v1 = store.delete_where_dv("k >= 50")
    v2 = store.purge_dv(target_partitions=1)
    m2 = store.manifest(v2)
    assert m2["operation"] == "purge" and m2["dvs"] == []
    assert sum(f["rows"] for f in m2["files"]) == 50
    assert _ks(store.read()) == list(range(50))
    # time travel across the purge: v1 still merge-on-read
    assert _ks(store.read(version=v1)) == list(range(50))
    # purge with nothing outstanding: no new version
    assert store.purge_dv() == v2


def test_compact_after_dv_delete_clears_dvs(store, spark):
    store.append(_df(spark, 0, 40))
    store.delete_where_dv("k < 5")
    v = store.compact(target_partitions=1)
    assert store.manifest(v)["dvs"] == []
    assert _ks(store.read()) == list(range(5, 40))


def test_merge_does_not_resurrect_dv_deleted_rows(store, spark):
    import pyspark.sql.functions as F

    store.append(_df(spark, 0, 30))
    store.delete_where_dv("k BETWEEN 10 AND 19")
    # upsert k in [0, 4] shifted — rewrite touches the file; dv-deleted
    # rows must not come back in the rewritten file
    src = _df(spark, 0, 5).withColumn("k", F.col("k") + F.lit(1000))
    store.merge(src, key="k")
    got = _ks(store.read())
    assert got == list(range(0, 10)) + list(range(20, 30)) + list(
        range(1000, 1005)
    )


def test_cow_delete_after_dv_delete(store, spark):
    store.append(_df(spark, 0, 30))
    store.delete_where_dv("k < 5")
    store.delete_where("k >= 25")  # copy-on-write path over dv-filtered scan
    assert _ks(store.read()) == list(range(5, 25))


def test_append_after_dv_delete_carries_dvs(store, spark):
    store.append(_df(spark, 0, 20))
    store.delete_where_dv("k < 10")
    store.append(_df(spark, 100, 110))
    assert _ks(store.read()) == list(range(10, 20)) + list(range(100, 110))


def test_changes_across_dv_delete(store, spark):
    v0 = store.append(_df(spark, 0, 20))
    v1 = store.delete_where_dv("k % 5 = 0")
    ch = store.changes(v0, v1).collect()
    assert sorted((r.k, r.change_type) for r in ch) == [
        (0, "delete"),
        (5, "delete"),
        (10, "delete"),
        (15, "delete"),
    ]


def test_changes_across_restore_of_dv_delete(store, spark):
    v0 = store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k = 3")
    v2 = store.restore(v0)
    assert _ks(store.read()) == list(range(10))
    ch = store.changes(v1, v2).collect()
    assert [(r.k, r.change_type) for r in ch] == [(3, "insert")]
    # and the full round trip nets out
    assert store.changes(v0, v2).count() == 0


def test_changes_dv_delete_plus_append(store, spark):
    v0 = store.append(_df(spark, 0, 10))
    store.delete_where_dv("k = 0")
    v2 = store.append(_df(spark, 50, 52))
    ch = sorted(
        (r.k, r.change_type) for r in store.changes(v0, v2).collect()
    )
    assert ch == [(0, "delete"), (50, "insert"), (51, "insert")]


def test_restore_restores_dvs(store, spark):
    store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k < 3")
    store.purge_dv()
    v3 = store.restore(v1)
    assert store.manifest(v3)["dvs"] == store.manifest(v1)["dvs"]
    assert _ks(store.read()) == list(range(3, 10))


def test_vacuum_keeps_dv_files(store, spark):
    store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k = 1")
    dv_paths = [
        os.path.join(store.root, e["path"]) for e in store.manifest(v1)["dvs"]
    ]
    # vacuum may reclaim the ZERO-ROW part files the dv stage wrote (the
    # manifest never references them); the referenced dv files are live
    store.vacuum_orphans()
    assert all(os.path.exists(p) for p in dv_paths)
    assert _ks(store.read(version=v1)) == [0] + list(range(2, 10))


def test_expire_reclaims_dv_files_with_their_versions(store, spark):
    store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k = 1")
    dv_paths = [
        os.path.join(store.root, e["path"]) for e in store.manifest(v1)["dvs"]
    ]
    store.purge_dv()
    assert all(os.path.exists(p) for p in dv_paths)
    store.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in dv_paths)
    assert _ks(store.read()) == [0] + list(range(2, 10))


def test_dv_delete_matching_nothing_is_noop(store, spark):
    # round 7 (ADVICE r6): a predicate matching zero rows must NOT commit
    # a new version — no-op 'delete-dv' versions churned history and the
    # CDF stream cadence (mirrors purge_dv's short-circuit)
    v0 = store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k > 1000")
    assert v1 == v0
    assert store.latest_version() == v0
    assert store.read().count() == 10


def test_dv_store_is_relocatable(store, spark, tmp_path):
    # round 7 (ADVICE r6): dv positions are recorded root-relative, so
    # moving/copying the store root must keep dv-deleted rows deleted on
    # every read path and keep changes() resolving dv deltas
    import shutil

    v0 = store.append(_df(spark, 0, 20).repartition(2))
    v1 = store.delete_where_dv("k % 5 = 0")
    moved_root = str(tmp_path / "relocated" / "tbl")
    shutil.copytree(store.root, moved_root)
    moved = SnapshotStore(spark, moved_root)
    assert _ks(moved.read()) == [k for k in range(20) if k % 5 != 0]
    assert _ks(moved.read_where("k", 0, 10)) == [k for k in range(11) if k % 5]
    ch = sorted((r.k, r.change_type) for r in moved.changes(v0, v1).collect())
    assert ch == [(0, "delete"), (5, "delete"), (10, "delete"), (15, "delete")]
    # and further dv deletes on the moved store compose with the old ones
    moved.delete_where_dv("k = 1")
    assert _ks(moved.read()) == [
        k for k in range(20) if k % 5 != 0 and k != 1
    ]


def test_dv_legacy_absolute_paths_still_match(store, spark):
    # dv files written before round 7 stored absolute file: URIs; the
    # root-relative normalizer must keep matching them. Simulate a legacy
    # store by rewriting the positions file to the absolute form.
    store.append(_df(spark, 0, 10))
    v1 = store.delete_where_dv("k < 3")
    for e in store.manifest(v1)["dvs"]:
        p = os.path.join(store.root, e["path"])
        pdf = spark.read.parquet(p).toPandas()
        assert all(fp.startswith("data/") for fp in pdf["file_path"])
        pdf["file_path"] = [
            "file://" + os.path.abspath(os.path.join(store.root, fp))
            for fp in pdf["file_path"]
        ]
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
        import shutil

        os.remove(p)  # manifest entries point at single parquet files
        crc = os.path.join(
            os.path.dirname(p), "." + os.path.basename(p) + ".crc"
        )
        if os.path.exists(crc):  # stale hadoop checksum sidecar
            os.remove(crc)
        part = next(
            n for n in os.listdir(p + ".tmp") if n.endswith(".parquet")
        )
        shutil.move(os.path.join(p + ".tmp", part), p)
        shutil.rmtree(p + ".tmp")
    assert _ks(store.read()) == list(range(3, 10))
