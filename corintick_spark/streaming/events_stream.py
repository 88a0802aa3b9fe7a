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
    if os.path.isdir(src_file):
        # already a directory of part files (e.g. the generated sf1 set) —
        # stream it directly; a symlinked nested dir would list ZERO files
        # (FileStreamSource does not recurse) and silently stream nothing
        stage = src_file
    else:
        # FileStreamSource requires a directory; stage the (read-only)
        # single-file parquet into a temp dir via symlink — no data copy.
        # Removed at interpreter exit (it must outlive whatever queries the
        # caller starts on it).
        stage = tempfile.mkdtemp(prefix="events_stream_")
        _cleanup_at_exit(stage)
        os.symlink(src_file, os.path.join(stage, "events.parquet"))
    src = spark.readStream.schema(batch.schema).parquet(stage)
    from corintick_spark.catalog import normalize_event_time

    return _epoch_floor(normalize_event_time(src))


def _epoch_floor(df: DataFrame) -> DataFrame:
    """Restrict the stream to event times at/after 1970-01-01.

    Spark's event-time watermark ORIGIN is epoch 0: stateful operators
    (session_window, dropDuplicatesWithinWatermark, multi-batch window
    aggs) treat pre-epoch events as already-late and silently drop them —
    verified empirically on the edge dataset's 1969 rows (a tumbling agg in
    a single AvailableNow batch keeps them, but every other stateful shape
    does not). Real streams carry current timestamps, so the engine
    contract is explicit: streaming queries process ts >= epoch, and every
    streaming oracle carries the identical WHERE clause (a no-op on the
    driver testdata, whose timelines start in 2024).
    """
    return df.filter(F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp"))


def events_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed as FIVE chronological micro-batches with planted
    LATE arrivals — the replay that makes watermark semantics real
    (the single-file replay above never drops anything).

    Watermark timing (verified empirically on this Spark; SPARK-40925's
    multi-stateful-operator split): in micro-batch N, *state eviction* uses
    the watermark computed from data through batch N-1, but *late-event
    filtering* uses the watermark a batch older (through N-2). So a late
    row must arrive at least TWO batches after the data that advanced the
    watermark past it — hence the late set gets its own batch after both
    halves of the timeline.

    Construction (deterministic, mirrored by the stream_late_drop oracle):

    - late set  = events in the earliest decile of the time span with
      ``event_id % 7 == 0`` (non-empty at every SF);
    - batch 1   = first half of the timeline MINUS the late set;
    - batch 2   = second half of the timeline;
    - batch 3   = the late set alone — by now the late-filter watermark
      sits at ~mid-timeline minus 10 min, ~12 days past their event time,
      so the aggregation MUST drop every row of this batch;
    - batches 4/5 = one ``__sentinel__`` row each at +30/+60 days: the
      second sentinel's batch runs with an eviction watermark already past
      every real window, so append mode emits them all whether or not a
      trailing no-data batch fires; a sentinel's own window can never pass
      the final watermark, and the query filters the type out anyway.

    Files get strictly increasing mtimes and the reader takes
    ``maxFilesPerTrigger=1``, so AvailableNow processes them oldest-first
    as five separate micro-batches.
    """
    import shutil
    import time

    from corintick_spark.catalog import configure

    configure(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"] != "bigint":
        # µs-timestamp testdata vintage — canonicalize to int64 epoch ns so
        # the batch construction below works in plain integer arithmetic
        raw = raw.withColumn(
            "ts",
            F.expr("unix_micros(cast(ts as timestamp)) * cast(1000 as bigint)"),
        )
    # same epoch-floor contract as events_stream (see _epoch_floor): the
    # filter runs BEFORE the min/max batch construction so the planted-late
    # decile boundary matches the oracle's identically-filtered CTE
    raw = raw.filter(F.col("ts") >= 0)
    mn, mx = raw.agg(F.min("ts"), F.max("ts")).first()
    t_early = mn + (mx - mn) // 10
    mid = mn + (mx - mn) // 2
    late = (F.col("ts") <= F.lit(t_early)) & (F.col("event_id") % 7 == 0)
    day_ns = 86_400 * 1_000_000_000
    sentinel = raw.orderBy("event_id").limit(1).withColumn(
        "event_type", F.lit("__sentinel__")
    )
    batches = [
        raw.filter((F.col("ts") < F.lit(mid)) & ~late),
        raw.filter(F.col("ts") >= F.lit(mid)),
        raw.filter(late),
        sentinel.withColumn("ts", F.lit(mx + 30 * day_ns)),
        sentinel.withColumn("ts", F.lit(mx + 60 * day_ns)),
    ]
    stage = tempfile.mkdtemp(prefix="events_late_")
    _cleanup_at_exit(stage)
    t0 = time.time()
    for i, b in enumerate(batches):
        tmp = tempfile.mkdtemp(prefix="events_late_w_")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(stage, f"batch_{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    src = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    # staged batch files always carry int64 ns (canonicalized above), so
    # this takes normalize_event_time's bigint branch
    from corintick_spark.catalog import normalize_event_time

    return normalize_event_time(src)


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


def _worker_spawn_flake(exc: Exception) -> bool:
    """True for the one transient failure worth a retry: the JVM timed out
    waiting for a freshly forked Python worker to connect back (a hardcoded
    accept timeout in PythonWorkerFactory) — seen under heavy GC/load in
    long benchmark sessions, always at stream INITIALIZING before any batch
    commits. Query/data errors never match this message."""
    return "failed to connect back" in str(exc).lower()


_SPAWN_ATTEMPTS = 3  # two CONSECUTIVE spawn flakes observed (round 12)


def _run(stream_df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    import shutil

    for attempt in range(_SPAWN_ATTEMPTS):
        # a fresh sink name + fresh checkpoint per attempt: re-running from
        # scratch is semantically identical (nothing committed on a spawn
        # flake), and the caller's timer spans both attempts
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
        try:
            q.awaitTermination()
        except Exception as e:
            shutil.rmtree(ckpt, ignore_errors=True)
            # drop the failed attempt's memory-sink table (ADVICE r11): in
            # append/update modes a partial batch may sit in the temp view,
            # holding driver memory for the session's life
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
            if attempt < _SPAWN_ATTEMPTS - 1 and _worker_spawn_flake(e):
                continue
            raise
        # the query is finished (AvailableNow) and the memory-sink table
        # lives in the session, not the checkpoint — safe to drop the WAL
        shutil.rmtree(ckpt, ignore_errors=True)
        return spark.table(name)


def events_stream_batched(
    spark: SparkSession, sf_dir: str, n_batches: int = 4
) -> DataFrame:
    """events replayed as ``n_batches`` CHRONOLOGICAL micro-batches (time-
    range splits, strictly increasing file mtimes, maxFilesPerTrigger=1) —
    the replay for cross-batch stateful operators whose semantics must
    equal the batch fold (e.g. stream_throttle): every row of batch i
    precedes every row of batch i+1 in event time, so carrying per-key
    state across batches reproduces the global per-key chronological scan.

    Equal-ts rows never straddle a boundary (splits are half-open ts
    ranges), and the epoch-floor contract applies before the boundaries
    are computed (see _epoch_floor)."""
    import shutil
    import time

    from corintick_spark.catalog import configure, normalize_event_time

    configure(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"] != "bigint":
        raw = raw.withColumn(
            "ts",
            F.expr("unix_micros(cast(ts as timestamp)) * cast(1000 as bigint)"),
        )
    raw = raw.filter(F.col("ts") >= 0)
    head = raw.agg(F.min("ts"), F.max("ts")).first()
    if head[0] is None:  # empty source -> single empty batch
        bounds = []
    else:
        mn, mx = head
        step = max(1, (mx - mn) // n_batches + 1)
        bounds = [mn + i * step for i in range(1, n_batches)]
    cuts = [None, *bounds, None]
    batches = []
    for i in range(len(cuts) - 1):
        b = raw
        if cuts[i] is not None:
            b = b.filter(F.col("ts") >= F.lit(cuts[i]))
        if cuts[i + 1] is not None:
            b = b.filter(F.col("ts") < F.lit(cuts[i + 1]))
        batches.append(b)

    stage = tempfile.mkdtemp(prefix="events_batched_")
    _cleanup_at_exit(stage)
    t0 = time.time()
    for i, b in enumerate(batches):
        tmp = tempfile.mkdtemp(prefix="events_batched_w_")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(stage, f"batch_{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    src = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return normalize_event_time(src)


def run_processall_to_memory(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Run a stream whose SOURCE exhausts itself (offset stops advancing) to
    quiescence: processAllAvailable() blocks until no new data, then the
    query stops. The termination idiom for custom Python streaming sources,
    where Trigger.AvailableNow's end-offset snapshot is not supported."""
    import shutil

    for attempt in range(_SPAWN_ATTEMPTS):
        # fresh sink + checkpoint per attempt — see _run: only the
        # worker-spawn flake is retried
        name = "s" + uuid.uuid4().hex[:12]
        ckpt = tempfile.mkdtemp(prefix="ckpt_", dir=_ckpt_base())
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(ckpt, name))
            .start()
        )
        try:
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination()
        except Exception as e:
            shutil.rmtree(ckpt, ignore_errors=True)
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
            # No recentProgress guard (ADVICE r11): the py4j read inside the
            # handler could itself throw on a broken gateway — the very
            # condition being retried — masking the original exception; and
            # a complete-mode re-run from a fresh sink + checkpoint is
            # deterministic regardless of committed batches, same as _run's.
            if attempt < _SPAWN_ATTEMPTS - 1 and _worker_spawn_flake(e):
                continue
            raise
        shutil.rmtree(ckpt, ignore_errors=True)
        return spark.table(name)
