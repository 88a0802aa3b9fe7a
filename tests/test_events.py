"""Semantic properties of the event-log operators (beyond the oracle
hash-match): SCD2 intervals must tile each user's timeline, CDC merge must
surface the true last event."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.registry import load_all


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    reg = load_all()
    pdf = (
        reg["scd2_intervals"].spark(spark, sf_dir).toPandas()
        .sort_values(["user_id", "valid_from"])
    )
    ev = table(spark, sf_dir, "events")
    first_ts = {
        r.user_id: r.t
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("t")).collect()
    }
    for uid, g in pdf.groupby("user_id"):
        g = g.reset_index(drop=True)
        # chain: each interval closes exactly where the next opens
        assert (
            g["valid_to"].iloc[:-1].reset_index(drop=True)
            == g["valid_from"].iloc[1:].reset_index(drop=True)
        ).all(), uid
        # exactly one open (current) interval per user, and it is the last
        assert g["valid_to"].isna().sum() == 1 and pd.isna(g["valid_to"].iloc[-1])
        assert bool(g["is_current"].iloc[-1])
        # starts at the user's first event
        assert g["valid_from"].iloc[0] == pd.Timestamp(first_ts[uid])
        # consecutive intervals always change type (runs were collapsed)
        assert (
            g["event_type"].iloc[:-1].reset_index(drop=True)
            != g["event_type"].iloc[1:].reset_index(drop=True)
        ).all(), uid


def test_cdc_merge_is_true_last_event(spark, sf_dir):
    reg = load_all()
    pdf = reg["cdc_merge"].spark(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events")
    last = {
        r.user_id: r.t
        for r in ev.groupBy("user_id").agg(F.max("ts").alias("t")).collect()
    }
    assert len(pdf) == len(last)  # exactly one row per key
    for _, row in pdf.iterrows():
        assert row.last_ts == pd.Timestamp(last[row.user_id]), row.user_id
