"""Batch sessionization: gap-based session assignment over an event log.

The classic lag→flag→cumsum construction, fully window-expressible (no
Python, no iteration):

  1. per key, order events by time; a session break is a gap > ``gap_us``
  2. session_id = running sum of break flags (rows-frame cumulative)
  3. aggregate per (key, session_id)

Scale notes: step 1-2 share ONE hash exchange on the key; the final
aggregate re-shuffles on (key, session_id) — unavoidable in any engine
since session boundaries are data-dependent, and cheap because the
window output is already key-clustered (AQE coalesces the second
exchange's skew). Timestamps are compared at microsecond precision
(``ts_ns div 1000``) so the DuckDB oracle — whose parquet reader
truncates nanos to micros — applies identical gap decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_us: str = "ts_us",
    order_tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,  # 30 minutes
) -> DataFrame:
    """Assign 1-based session ids per key; gaps > gap_us start a new session."""
    w = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    prev = F.lag(ts_us).over(w)
    is_break = F.when(
        prev.isNull() | (F.col(ts_us) - prev > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(is_break)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )


def session_stats(sessions: DataFrame, key: str = "user_id", ts_us: str = "ts_us") -> DataFrame:
    """Per-session aggregates: event count, span, first/last microsecond."""
    return sessions.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(ts_us).alias("first_us"),
        F.max(ts_us).alias("last_us"),
        (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
    )
