"""Structured Streaming over the events table — T-B4, T-B39..B43.

The reference is batch-only (MongoDB inserts + reads †); streaming is the
Spark-native extension for live tick ingestion. The events parquet is
replayed as a file-source stream; results land in a memory sink via
Trigger.AvailableNow so each query terminates deterministically (and, with
the whole table in one file, watermarking drops nothing — making tumbling/
session results equal to their batch equivalents, which is what lets the
driver oracle-check streaming output against plain SQL).

At production scale the same code runs on a Kafka source with real
watermarks; only `readStream` options change — the transformation graph is
identical (this symmetry is the point of Structured Streaming).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from corintick_spark.catalog import table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (ts derived exactly as the
    batch catalog does, so streaming and batch agree to the microsecond)."""
    from corintick_spark.catalog import configure

    configure(spark)
    src_file = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src_file)
    # FileStreamSource requires a directory; stage the (read-only) parquet
    # into a temp dir via symlink — no data copy. Removed at interpreter
    # exit (it must outlive whatever queries the caller starts on it).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    _cleanup_at_exit(stage)
    os.symlink(src_file, os.path.join(stage, "events.parquet"))
    src = spark.readStream.schema(batch.schema).parquet(stage)
    return src.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.expr("timestamp_micros(ts_ns div 1000)")
    )


def run_to_memory(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming query to completion (AvailableNow) into a memory
    sink; return the final result as a batch DataFrame."""
    return _run(stream_df, spark, "complete")


def run_append_to_memory(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """As run_to_memory but append output mode (for dedup/row streams)."""
    return _run(stream_df, spark, "append")


def run_update_to_memory(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """As run_to_memory but update output mode (stateful processors)."""
    return _run(stream_df, spark, "update")


def _ckpt_base() -> str:
    # checkpoint WAL fsyncs dominate short streaming runs; tmpfs when present
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _cleanup_at_exit(path: str) -> None:
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, True)


def _run(stream_df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    import shutil

    name = "s" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="ckpt_", dir=_ckpt_base())
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(ckpt, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the query is finished (AvailableNow) and the memory-sink table lives
    # in the session, not the checkpoint — safe to drop the WAL now
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
