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


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long")


def test_merge_upserts_and_prunes_disjoint_files(store, spark):
    """MERGE must replace matched keys, insert unmatched ones, and carry
    files whose footer key range is disjoint from the source forward
    UNCHANGED (same path in the new manifest — the 100 TB pruning claim)."""
    store.append(_kv(spark, [(i, i * 10) for i in range(0, 50)]).coalesce(1))
    store.append(
        _kv(spark, [(i, i * 10) for i in range(1000, 1050)]).coalesce(1)
    )
    base_paths = {f["path"] for f in store.manifest(1)["files"]}
    low_file = next(
        f["path"]
        for f in store.manifest(1)["files"]
        if f["stats"]["k"][1] < 1000
    )
    v = store.merge(
        _kv(spark, [(1005, -1), (1010, -2), (2000, -3)]), key="k"
    )
    got = {(r.k, r.v) for r in store.read(version=v).collect()}
    expect = {(i, i * 10) for i in range(0, 50)}
    expect |= {(i, i * 10) for i in range(1000, 1050) if i not in (1005, 1010)}
    expect |= {(1005, -1), (1010, -2), (2000, -3)}
    assert got == expect
    new_paths = {f["path"] for f in store.manifest(v)["files"]}
    assert low_file in new_paths, "disjoint file must be carried, not rewritten"
    assert not (new_paths - {low_file}) & base_paths, (
        "overlapping file must be rewritten into new files"
    )
    # time travel across the merge still sees the pre-merge rows
    assert store.read(version=1).filter("k = 1005").collect()[0].v == 10050


def test_merge_empty_store_and_empty_source(store, spark):
    v0 = store.merge(_kv(spark, [(1, 1), (2, 2)]), key="k")
    assert v0 == 0 and store.read().count() == 2
    v1 = store.merge(_kv(spark, []), key="k")
    assert v1 == 1 and store.read(version=v1).count() == 2


def test_changes_across_merge_and_compaction(store, spark):
    v0 = store.append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    v1 = store.merge(_kv(spark, [(2, 99), (4, 40)]), key="k")
    ch = {
        (r.k, r.v, r.change_type)
        for r in store.changes(v0, v1).collect()
    }
    assert ch == {
        (2, 99, "insert"), (4, 40, "insert"), (2, 20, "delete"),
    }
    # a pure rewrite (compaction) is a no-op in the row-level feed
    v2 = store.compact(target_partitions=1)
    assert store.changes(v1, v2).count() == 0
    # and the full span composes: v0 -> v2 equals v0 -> v1
    ch02 = {
        (r.k, r.v, r.change_type)
        for r in store.changes(v0, v2).collect()
    }
    assert ch02 == ch


def test_delete_where_prunes_and_time_travels(store, spark):
    store.append(_kv(spark, [(i, i) for i in range(0, 50)]).coalesce(1))
    store.append(_kv(spark, [(i, i) for i in range(1000, 1050)]).coalesce(1))
    low_file = next(
        f["path"]
        for f in store.manifest(1)["files"]
        if f["stats"]["k"][1] < 1000
    )
    v = store.delete_where("k >= 1040", prune=("k", 1040, 10**9))
    assert store.read(version=v).count() == 90
    assert store.read(version=v).filter("k >= 1040").count() == 0
    new_paths = {f["path"] for f in store.manifest(v)["files"]}
    assert low_file in new_paths, "disjoint file must be carried"
    assert store.read(version=1).count() == 100  # time travel past delete
    with pytest.raises(ValueError):
        SnapshotStore(spark, store.root + "_none").delete_where("k > 0")


def test_schema_evolution_append_and_conflict(store, spark):
    store.append(_kv(spark, [(1, 10), (2, 20)]))
    v1 = store.append(
        spark.createDataFrame([(3, 30, "x")], "k long, v long, tag string")
    )
    assert [f["name"] for f in store.manifest(v1)["schema"]["fields"]] == [
        "k", "v", "tag",
    ]
    got = {(r.k, r.v, r.tag) for r in store.read().collect()}
    assert got == {(1, 10, None), (2, 20, None), (3, 30, "x")}
    with pytest.raises(ValueError, match="schema conflict"):
        store.append(
            spark.createDataFrame([(4, "oops")], "k long, v string")
        )
    # merge respects evolution too: upsert with the evolved schema
    v3 = store.merge(
        spark.createDataFrame([(2, 99, "y")], "k long, v long, tag string"),
        key="k",
    )
    got = {(r.k, r.v, r.tag) for r in store.read(version=v3).collect()}
    assert got == {(1, 10, None), (2, 99, "y"), (3, 30, "x")}


def test_append_once_epoch_retry_exactly_once(store, spark):
    """append_once must commit an epoch exactly once: a replayed epoch
    (foreachBatch retry) finds its token and no-ops, later epochs still
    append, and the final table has no duplicates."""
    b0 = _kv(spark, [(1, 10), (2, 20)])
    b1 = _kv(spark, [(3, 30)])
    v0 = store.append_once(b0, token="epoch-0")
    assert store.append_once(b0, token="epoch-0") == v0  # retry no-ops
    assert store.latest_version() == v0 == 0
    v1 = store.append_once(b1, token="epoch-1")
    assert v1 == 1
    assert store.append_once(b1, token="epoch-1") == v1  # late replay
    assert store.append_once(b0, token="epoch-0") == v0  # very late replay
    got = sorted((r.k, r.v) for r in store.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    assert [h["operation"] for h in store.history()] == ["append", "append"]


def test_read_where_prunes_and_is_exact(store, spark):
    import pyspark.sql.functions as F

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    store.append(df.repartitionByRange(8, "k"))
    kept, skipped = store.prune_files("k", 100, 199)
    assert skipped, "range-clustered files must be skippable"
    assert len(kept) < 8
    got = sorted(r.k for r in store.read_where("k", 100, 199).collect())
    assert got == list(range(100, 200))


def test_read_where_empty_range_and_no_stats(store, spark):
    import pyspark.sql.functions as F

    store.append(spark.range(0, 100).select(F.col("id").alias("k")))
    # disjoint range: zero rows, zero files opened
    kept, skipped = store.prune_files("k", 5000, 6000)
    assert not kept and skipped
    assert store.read_where("k", 5000, 6000).count() == 0
    # column with no recorded stats (nonexistent) keeps every file,
    # residual filter then fails analysis only on select — prune is safe
    kept2, skipped2 = store.prune_files("nope", 0, 1)
    assert kept2 and not skipped2


def test_read_where_null_keys_excluded(store, spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "k bigint")
    store.append(df)
    assert sorted(
        r.k for r in store.read_where("k", 0, 10).collect()
    ) == [1, 3]


def test_cluster_by_tightens_second_dimension(store, spark):
    import pyspark.sql.functions as F

    # x ordered, y decorrelated: a range layout on x gives y full-range
    # bounds in every file; z-order makes y prunable too
    df = spark.range(0, 4096).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % 4096).alias("y"),
    )
    store.append(df.repartitionByRange(8, "x"))
    _, skipped_before = store.prune_files("y", 0, 255)
    v = store.cluster_by(["x", "y"], target_files=8)
    assert store.manifest(v)["operation"] == "cluster"
    _, skipped_after = store.prune_files("y", 0, 255)
    assert len(skipped_after) > len(skipped_before)
    # pure rewrite: results identical, CDC across it is empty
    got = sorted((r.x, r.y) for r in store.read().collect())
    want = sorted((r.x, r.y) for r in store.read(version=0).collect())
    assert got == want
    assert store.changes(0, v).count() == 0
    # and read_where on y is exact post-cluster
    ys = sorted(r.y for r in store.read_where("y", 0, 255).collect())
    assert ys == sorted(
        r.y for r in df.filter(F.col("y").between(0, 255)).collect()
    )


def test_refresh_aggregate_matches_recompute(store, spark):
    import pyspark.sql.functions as F

    from corintick_spark.snapshots import refresh_aggregate

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 3 % 100).alias("x"),
    )
    v0 = store.append(df)
    agg0 = store.read(version=v0).groupBy("g").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("x").cast("bigint")).alias("sum_x"),
    )
    # merge: update k%3==0 (x+1000), insert new keys 500..520
    src = df.filter(F.col("k") % 3 == 0).withColumn(
        "x", F.col("x") + 1000
    ).unionByName(
        spark.range(500, 521).select(
            F.col("id").alias("k"),
            F.lit("9").alias("g"),
            F.lit(5).alias("x"),
        )
    )
    v1 = store.merge(src, key="k")
    got = refresh_aggregate(
        agg0, store.changes(v0, v1), ["g"], {"x": "sum_x"}
    )
    want = store.read(version=v1).groupBy("g").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("x").cast("bigint")).alias("sum_x"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_refresh_aggregate_drops_emptied_groups(store, spark):
    import pyspark.sql.functions as F

    from corintick_spark.snapshots import refresh_aggregate

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, g string, x long"
    )
    v0 = store.append(df)
    agg0 = store.read(version=v0).groupBy("g").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("x").cast("bigint")).alias("sum_x"),
    )
    v1 = store.delete_where("g = 'b'")
    got = refresh_aggregate(agg0, store.changes(v0, v1), ["g"], {"x": "sum_x"})
    rows = {r.g: (r.n_rows, r.sum_x) for r in got.collect()}
    assert rows == {"a": (2, 30)}


def test_bloom_index_skips_files_point_lookup(store, spark):
    import pyspark.sql.functions as F

    # hash-scattered layout: every file spans the full key range, so
    # min/max bounds can never skip — only the bloom can
    df = spark.range(0, 4000).select(F.col("id").alias("k"))
    store.append(df.repartition(8, "k"))
    v = store.index_bloom(["k"], num_bits=1 << 13)
    assert store.manifest(v)["operation"] == "index"
    m = store.manifest(v)
    assert all("bloom" in f and "k" in f["bloom"] for f in m["files"])

    # equality probe: exact result + actual file skipping (the scan must
    # list fewer paths than the snapshot holds — min/max can't skip here)
    got = store.read_where_eq("k", 1234)
    assert [r.k for r in got.collect()] == [1234]
    import re

    plan = got._jdf.queryExecution().executedPlan().toString()
    n_paths = int(re.search(r"InMemoryFileIndex\((\d+) paths", plan).group(1))
    assert n_paths < 8, f"bloom skipped nothing ({n_paths}/8 files scanned)"
    # value present nowhere: bloom prunes every file (min/max cannot)
    assert store.read_where_eq("k", 3999 + 1).count() == 0


def test_bloom_index_missing_entry_is_scanned_not_skipped(store, spark):
    import pyspark.sql.functions as F

    store.append(spark.range(0, 100).select(F.col("id").alias("k")))
    store.index_bloom(["k"])
    # a rewrite drops the bloom entries (new files) — lookups still exact
    store.compact(target_partitions=2)
    assert [r.k for r in store.read_where_eq("k", 42).collect()] == [42]
    with pytest.raises(ValueError):
        store.read_where_eq("k", None)


def test_check_constraints_enforced_on_writes(store, spark):
    import pyspark.sql.functions as F

    store.append(_kv(spark, [(1, 10), (2, 20)]))
    v = store.add_constraint("v_positive", "v > 0")
    assert store.manifest(v)["operation"] == "constraint"
    # good writes pass; violating writes are rejected BEFORE staging
    store.append(_kv(spark, [(3, 30)]))
    with pytest.raises(ValueError, match="v_positive"):
        store.append(_kv(spark, [(4, -1)]))
    with pytest.raises(ValueError, match="v_positive"):
        store.merge(_kv(spark, [(1, -5)]), key="k")
    with pytest.raises(ValueError, match="v_positive"):
        store.append_once(_kv(spark, [(9, 0)]), token="e1")
    assert store.read().count() == 3  # nothing staged by rejected writes
    # NULL passes (SQL CHECK semantics)
    store.append(
        spark.createDataFrame([(5, None)], "k long, v long")
    )
    # constraints survive unrelated commits (compact inherits them)
    store.compact(target_partitions=1)
    with pytest.raises(ValueError, match="v_positive"):
        store.overwrite(_kv(spark, [(1, -1)]))
    # drop, then the same write succeeds
    store.drop_constraint("v_positive")
    store.append(_kv(spark, [(4, -1)]))


def test_add_constraint_rejects_violating_history(store, spark):
    store.append(_kv(spark, [(1, -10)]))
    with pytest.raises(ValueError, match="existing rows violate"):
        store.add_constraint("v_positive", "v > 0")
    with pytest.raises(ValueError, match="no constraint"):
        store.drop_constraint("nope")


def test_overwrite_once_token_idempotent(store, spark):
    v0 = store.overwrite_once(_kv(spark, [(1, 1)]), token="e0")
    v1 = store.overwrite_once(_kv(spark, [(2, 2), (3, 3)]), token="e1")
    assert (v0, v1) == (0, 1)
    # retry of e1 returns the committed version, writes nothing
    assert store.overwrite_once(_kv(spark, [(9, 9)]), token="e1") == v1
    assert sorted(r.k for r in store.read().collect()) == [2, 3]


def test_read_asof_timestamp(store, spark):
    store.append(_kv(spark, [(1, 1)]))
    store.append(_kv(spark, [(2, 2)]))
    ts0 = store.manifest(0)["committed_at"]
    ts1 = store.manifest(1)["committed_at"]
    # at-or-before v1's commit time resolves to the LATEST version in
    # that second (commit order), and a far-future ts sees everything
    assert store.read_asof("2999-01-01T00:00:00Z").count() == 2
    got = store.read_asof(ts1).count()
    assert got == 2 if ts1 > ts0 else got in (1, 2)
    with pytest.raises(ValueError, match="no version"):
        store.read_asof("1999-01-01T00:00:00Z")


def test_restore_rolls_back_as_new_commit(store, spark):
    store.append(_kv(spark, [(1, 10), (2, 20)]))
    store.delete_where("k = 2")
    assert store.read().count() == 1
    v = store.restore(0)
    assert store.manifest(v)["operation"] == "restore"
    assert sorted(r.k for r in store.read().collect()) == [1, 2]
    # history stays linear: the delete's version is still readable
    assert store.read(version=1).count() == 1
    # a restore cannot bypass a constraint added after the target version:
    # current state satisfies v >= 15, but v0 holds a v=10 row
    store.overwrite(_kv(spark, [(5, 20)]))
    store.add_constraint("v_big", "v >= 15")
    with pytest.raises(ValueError, match="v_big"):
        store.restore(0)


def test_changes_across_schema_evolution(store, spark):
    """CDC across a schema-evolving rewrite: the removed side lacks the
    evolved column, so both deltas must align to the union schema
    (null-filling) before exceptAll — a raw read would raise
    AnalysisException or bind columns by position (ADVICE r05)."""
    import pyspark.sql.functions as F

    store.append(_kv(spark, [(1, 10), (2, 20)]))
    evolved = _kv(spark, [(1, 11), (3, 30)]).withColumn("tag", F.lit("new"))
    store.overwrite(evolved)
    ch = {
        (r.k, r.v, r.tag, r.change_type)
        for r in store.changes(0, 1).collect()
    }
    assert ch == {
        (1, 10, None, "delete"),
        (2, 20, None, "delete"),
        (1, 11, "new", "insert"),
        (3, 30, "new", "insert"),
    }
    # evolving APPEND: delta files straddle the evolution; compaction of
    # the evolved table still yields an empty feed
    v2 = store.append(_kv(spark, [(4, 40)]).withColumn("tag", F.lit("x")))
    ins = {(r.k, r.tag) for r in store.changes(1, v2).collect()}
    assert ins == {(4, "x")}
    v3 = store.compact(target_partitions=1)
    assert store.changes(v2, v3).count() == 0


def test_stage_files_skip_giant_string_stats(store, spark):
    """Strings at/above 1024 chars are outside every writer's
    exact-by-construction stats regime (truncation hazard, ADVICE r05):
    no bounds are recorded and pruning conservatively keeps the file."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "a" * 2000), (2, "z" * 2000)], "k long, s string"
    )
    store.append(df.coalesce(1))
    stats = store.manifest(0)["files"][0]["stats"]
    assert "s" not in stats
    assert "k" in stats  # numeric bounds still recorded
    kept, skipped = store.prune_files("s", "a", "b")
    assert skipped == [] and len(kept) == 1


def test_bloom_reindex_overwrites_all_files(store, spark):
    """index_bloom writes a FRESH entry for every file — including files
    with zero non-null values (all-zero filter: every probe misses, which
    is exact) — so stale entries from an earlier run with different
    parameters cannot coexist and read_where_eq probes each file with its
    own recorded (num_hashes, num_bits) pair (ADVICE r05)."""
    store.append(_kv(spark, [(i, i) for i in range(100)]).coalesce(1))
    store.append(
        spark.createDataFrame([(None, 7)] * 5, "k long, v long").coalesce(1)
    )
    store.index_bloom(["k"], num_bits=1 << 13, num_hashes=5)
    v = store.index_bloom(["k"], num_bits=1 << 13, num_hashes=3)
    for f in store.manifest(v)["files"]:
        assert f["bloom"]["k"]["hashes"] == 3, f["path"]
    # the all-NULL file carries an all-zero filter -> always skipped,
    # and point lookups stay exact
    got = sorted(r.k for r in store.read_where_eq("k", 42).collect())
    assert got == [42]


def test_expired_history_stream_contracts(store, spark):
    """snapcdf/snapcdfp after expire_snapshots: a FRESH stream treats the
    earliest retained version as all-added (Delta initial-snapshot shape);
    a stream whose position predates retained history gets a clear
    'expired' error, not FileNotFoundError. The partitioned reader also
    persists its planned high-water mark so a restarted reader never
    reports offsets below what it already planned (ADVICE r05)."""
    from corintick_spark.sources.cdf_source import (
        make_cdf_partitioned_datasource,
        make_cdf_stream_datasource,
    )

    for i in range(3):
        store.append(_kv(spark, [(i * 10 + j, j) for j in range(10)]))
    store.expire_snapshots(keep_last=1)  # only v2 remains

    opts = {"path": store.root, "columns": "k bigint, v bigint"}
    simple = make_cdf_stream_datasource()(opts).simpleStreamReader(None)
    # fresh stream: advances straight to v2, ALL rows added
    rows, off = simple.read({"v": -1})
    assert off == {"v": 2} and len(list(rows)) == 30
    # caught up afterwards
    rows, off = simple.read({"v": 2})
    assert off == {"v": 2} and list(rows) == []
    # mid-flight position below retained history -> clear error
    with pytest.raises(ValueError, match="expired"):
        simple.read({"v": 0})

    part = make_cdf_partitioned_datasource()(opts).streamReader(None)
    assert part.latestOffset() == {"v": 2}
    parts = part.partitions({"v": -1}, {"v": 2})
    total = sum(len(list(part.read(p))) for p in parts)
    assert total == 30
    with pytest.raises(ValueError, match="expired"):
        part.partitions({"v": 0}, {"v": 2})
    # restart: a NEW reader instance seeds from the persisted high-water
    # mark instead of -1 (which would plan backwards offsets)
    part2 = make_cdf_partitioned_datasource()(opts).streamReader(None)
    assert part2.latestOffset() == {"v": 2}


def test_merge_sync_scope_deletes_unmatched_in_scope(store, spark):
    """Scoped full sync (WHEN NOT MATCHED BY SOURCE DELETE with a
    condition): in-scope rows sync to the source exactly, out-of-scope
    rows are untouched."""
    import pyspark.sql.functions as F

    store.append(_df(spark, 0, 100))
    # authoritative re-feed of the k < 50 region: only even keys survive,
    # each shifted by +1000 in a second column
    src = (
        _df(spark, 0, 50)
        .filter(F.col("k") % 2 == 0)
        .withColumn("v", F.col("k") + F.lit(1000))
    )
    base_with_v = store.read().withColumn("v", F.lit(None).cast("long"))
    store.overwrite(base_with_v)
    store.merge(src, key="k", sync_scope="k < 50", scope_prune=("k", 0, 49))
    rows = {r.k: r.v for r in store.read().collect()}
    assert sorted(rows) == [k for k in range(50) if k % 2 == 0] + list(
        range(50, 100)
    )
    assert all(rows[k] == k + 1000 for k in range(0, 50, 2))
    assert all(rows[k] is None for k in range(50, 100))


def test_merge_sync_scope_carries_disjoint_files(store, spark):
    store.append(_df(spark, 0, 1000).repartitionByRange(4, "k"))
    src = _df(spark, 0, 10)
    v = store.merge(
        src, key="k", sync_scope="k < 250", scope_prune=("k", 0, 249)
    )
    before = {f["path"] for f in store.manifest(v - 1)["files"]}
    after = {f["path"] for f in store.manifest(v)["files"]}
    assert before & after, "files disjoint from key range AND scope carry"
    assert sorted(r.k for r in store.read().collect()) == list(range(10)) + list(
        range(250, 1000)
    )


def test_merge_sync_to_empty_source_clears_scope(store, spark):
    store.append(_df(spark, 0, 30))
    empty = _df(spark, 0, 0)
    store.merge(empty, key="k", sync_scope="k >= 20")
    assert sorted(r.k for r in store.read().collect()) == list(range(20))


def test_append_split_equals_sequential_appends(spark, tmp_path):
    """append_split (round 12): one partitioned write must commit exactly
    the versions that n sequential filtered appends would."""
    import pyspark.sql.functions as F

    df = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    seq = SnapshotStore(spark, str(tmp_path / "seq"))
    for i in range(3):
        seq.append(df.filter(F.col("k") % 3 == i))
    sp = SnapshotStore(spark, str(tmp_path / "sp"))
    assert sp.append_split(df, F.col("k") % 3, 3) == [0, 1, 2]
    for ver in range(3):
        assert sp.manifest(ver)["operation"] == "append"
        got = sp.read(version=ver)
        # the synthetic _split column never reaches readers
        assert got.columns == ["k", "v"]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, seq.read(version=ver).collect())
        )
        # no partition-directory segment survives in manifest paths
        assert all(
            "_split=" not in f["path"] for f in sp.manifest(ver)["files"]
        )


def test_append_split_empty_value_is_plain_append(spark, tmp_path):
    """A split value with no rows commits a version identical to its base
    (same file set), exactly like appending an empty frame."""
    import pyspark.sql.functions as F

    df = spark.range(10).select((F.col("id") * 2).alias("k"))  # all even
    sp = SnapshotStore(spark, str(tmp_path / "sp"))
    v_even, v_odd = sp.append_split(df, F.col("k") % 2, 2)
    assert sp.read(version=v_even).count() == 10
    assert sp.manifest(v_odd)["files"] == sp.manifest(v_even)["files"]
    assert sp.read(version=v_odd).count() == 10


def test_append_split_enforces_constraints(spark, tmp_path):
    import pyspark.sql.functions as F

    sp = SnapshotStore(spark, str(tmp_path / "sp"))
    sp.append(spark.range(5).withColumnRenamed("id", "k"))
    sp.add_constraint("pos", "k >= 0")
    with pytest.raises(ValueError, match="pos"):
        sp.append_split(
            spark.range(-4, 4).withColumnRenamed("id", "k"),
            F.abs(F.col("k")) % 2,
            2,
        )
