"""Watermark late-data semantics — the NON-vacuous streaming test.

Round 2's streaming queries replay events as one file → one micro-batch, so
withWatermark never dropped anything. stream_late_drop replays five
chronological micro-batches with a planted late batch; these tests assert
the watermark REALLY drops those rows (not just that the oracle matches —
the oracle check lives in test_oracle_queries like every other query).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _planted_late_count(spark, sf_dir: str) -> int:
    """The late-set rule, restated independently of the implementation."""
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"] != "bigint":
        # µs-timestamp testdata vintage — same epoch-ns canonicalization the
        # replay uses, so the decile boundary lands on the identical instant
        raw = raw.withColumn(
            "ts",
            F.expr("unix_micros(cast(ts as timestamp)) * cast(1000 as bigint)"),
        )
    mn, mx = raw.agg(F.min("ts"), F.max("ts")).first()
    t_early = mn + (mx - mn) // 10
    return raw.filter(
        (F.col("ts") <= F.lit(t_early)) & (F.col("event_id") % 7 == 0)
    ).count()


def test_late_rows_are_planted(spark, sf_dir):
    # a vacuous late set would make the whole exercise meaningless
    assert _planted_late_count(spark, sf_dir) > 0


def test_watermark_drops_exactly_the_late_set(spark, sf_dir):
    from corintick_spark.registry import load_all

    q = load_all()["stream_late_drop"]
    out = q.spark(spark, sf_dir)
    counted = out.agg(F.sum("n")).first()[0]
    total = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    n_late = _planted_late_count(spark, sf_dir)
    assert n_late > 0
    # every non-late event aggregated exactly once; every late event dropped
    assert counted == total - n_late


def test_no_sentinel_leaks(spark, sf_dir):
    from corintick_spark.registry import load_all

    q = load_all()["stream_late_drop"]
    out = q.spark(spark, sf_dir)
    assert out.filter(F.col("event_type") == "__sentinel__").count() == 0


def test_stream_throttle_equals_batch_fold(spark, sf_dir):
    """Stream/batch parity: the cross-batch stateful throttle over the
    4-batch chronological replay must emit exactly the batch greedy fold
    (events_throttle) — pins that per-key state actually carries across
    micro-batch boundaries."""
    from corintick_spark.registry import load_all

    qs = load_all()
    got = sorted(map(tuple, qs["stream_throttle"].spark(spark, sf_dir).collect()))
    want = sorted(map(tuple, qs["events_throttle"].spark(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0
