"""Python streaming sink (DataSourceStreamWriter): epoch-manifest
exactly-once semantics.

Beyond the registry round-trip (sink_stream_python), these pin the commit
protocol itself: multi-epoch manifests, orphan invisibility (a staged or
renamed file not listed in any manifest must never be read back), retry
idempotency (re-committing an epoch replaces its manifest), and abort
cleanup."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyspark.sql.functions as F

from corintick_spark.sources.stream_sink import (
    committed_epochs,
    make_jsonl_stream_sink,
    read_back,
    register,
)


class _Row:
    def __init__(self, d):
        self._d = d

    def asDict(self):
        return self._d


def _writer(path):
    _, JsonlEpochWriter = make_jsonl_stream_sink()
    return JsonlEpochWriter(path)


def test_epoch_commit_and_orphan_invisibility():
    path = tempfile.mkdtemp(prefix="sinktest_")
    try:
        w = _writer(path)
        m0 = w.write(iter([_Row({"k": 1}), _Row({"k": 2})]))
        w.commit([m0], 0)
        # an orphan part file (failed attempt's rename that never made a
        # manifest) must be invisible to read_back
        with open(os.path.join(path, "part-orphan.jsonl"), "w") as fh:
            fh.write('{"k": 999}\n')
        m1 = w.write(iter([_Row({"k": 3})]))
        w.commit([m1], 1)
        assert committed_epochs(path) == [0, 1]
        got = sorted(r["k"] for r in read_back(path))
        assert got == [1, 2, 3]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_retry_replaces_manifest():
    """A retried epoch's commit REPLACES the manifest — the first
    attempt's rows vanish, never double-count."""
    path = tempfile.mkdtemp(prefix="sinktest_")
    try:
        w = _writer(path)
        first = w.write(iter([_Row({"k": 10}), _Row({"k": 11})]))
        w.commit([first], 7)
        retry = w.write(iter([_Row({"k": 10}), _Row({"k": 11})]))
        w.commit([retry], 7)
        assert committed_epochs(path) == [7]
        assert sorted(r["k"] for r in read_back(path)) == [10, 11]
        manifest = json.load(
            open(os.path.join(path, "_commits", "7"))
        )
        assert manifest["rows"] == 2 and len(manifest["files"]) == 1
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_abort_cleans_staging():
    path = tempfile.mkdtemp(prefix="sinktest_")
    try:
        w = _writer(path)
        m = w.write(iter([_Row({"k": 1})]))
        w.abort([m], 3)
        assert committed_epochs(path) == []
        assert read_back(path) == []
        assert not os.listdir(os.path.join(path, "_staging"))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_end_to_end_multi_epoch(spark, sf_dir):
    """Three micro-batches through writeStream → three manifests; rows
    equal the batch equivalent exactly."""
    from corintick_spark.streaming.events_stream import events_stream_batched

    register(spark)
    src = (
        events_stream_batched(spark, sf_dir, n_batches=3)
        .filter(F.col("user_id") < 10)
        .select("event_id", "value")
    )
    path = tempfile.mkdtemp(prefix="sinktest_e2e_")
    ckpt = tempfile.mkdtemp(prefix="sinktest_ckpt_")
    try:
        q = (
            src.writeStream.format("jsonlsink")
            .option("path", path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(committed_epochs(path)) == 3
        got = sorted(r["event_id"] for r in read_back(path))
        from corintick_spark.catalog import table, normalize_event_time

        want = sorted(
            r.event_id
            for r in normalize_event_time(
                table(spark, sf_dir, "events")
            )
            .filter("user_id < 10 AND ts >= TIMESTAMP '1970-01-01'")
            .select("event_id")
            .collect()
        )
        assert got == want
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
