"""Checkpoint recovery: a streaming aggregation stopped mid-replay must,
when restarted against the SAME checkpoint, finish with exactly the batch
answer — no lost and no double-counted micro-batches. This is the
exactly-once property everything else in the streaming tier assumes; the
memory sink is rebuilt per run, but the AGGREGATION STATE (and the source
offsets) live in the checkpoint, which is what the test exercises."""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pyspark.sql.functions as F
import pytest


def test_streaming_agg_recovers_from_checkpoint(spark, sf_dir):
    from corintick_spark.streaming.events_stream import events_stream_batched

    ckpt = tempfile.mkdtemp(prefix="recov_ckpt_")
    name1, name2 = "r" + uuid.uuid4().hex[:8], "r" + uuid.uuid4().hex[:8]

    def agg(src):
        return src.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("sv"),
        )

    # phase 1: same staged replay for both phases (the staging dir must be
    # identical across restarts, like a real durable source)
    src = events_stream_batched(spark, sf_dir, n_batches=4)
    q1 = (
        agg(src)
        .writeStream.format("memory")
        .queryName(name1)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    # let it commit at least one micro-batch, then kill it mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q1.lastProgress
        if p is not None and p["batchId"] >= 1:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    committed = len(os.listdir(os.path.join(ckpt, "commits")))
    assert committed >= 1, "no micro-batch committed before the kill"

    # phase 2: restart from the SAME checkpoint; run to quiescence
    q2 = (
        agg(src)
        .writeStream.format("memory")
        .queryName(name2)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    got = {
        (r["event_type"], r["n"], r["sv"])
        for r in spark.table(name2).collect()
    }
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    from corintick_spark.catalog import normalize_event_time

    want = {
        (r["event_type"], r["n"], r["sv"])
        for r in agg(
            normalize_event_time(batch).filter(
                F.col("ts") >= F.lit("1970-01-01").cast("timestamp")
            )
        ).collect()
    }
    assert got == want, "post-recovery state diverges from the batch answer"
    # and recovery genuinely resumed: phase 2 processed only the REMAINING
    # batches (total commits = 4 source files + possibly one no-data batch)
    total_commits = len(os.listdir(os.path.join(ckpt, "commits")))
    assert total_commits >= max(2, committed + 1)
