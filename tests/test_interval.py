"""Range-bucketed interval join: equivalence to the naive overlap join and
the plan property (equi-join, not nested loop) that justifies it."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.operators.interval import interval_overlap_join


def _intervals(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    windows = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("b_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("b_end"),
            F.col("event_id").alias("p_id"),
        )
    )
    return daily, windows


def test_bucketed_interval_join_matches_naive(spark, sf_dir):
    daily, windows = _intervals(spark, sf_dir)
    naive = daily.join(
        windows,
        (daily.user_id == windows.p_user)
        & (daily.a_start <= windows.b_end)
        & (daily.a_end >= windows.b_start),
    )
    bucketed = interval_overlap_join(
        daily,
        windows,
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        on=("user_id", "p_user"),
        bucket_width_s=6 * 3600,
    )
    n_naive = naive.dropDuplicates(daily.columns + windows.columns).count()
    assert bucketed.count() == n_naive
    # semi variant matches EXISTS semantics
    semi_naive = daily.join(
        windows,
        (daily.user_id == windows.p_user)
        & (daily.a_start <= windows.b_end)
        & (daily.a_end >= windows.b_start),
        "leftsemi",
    ).count()
    semi = interval_overlap_join(
        daily, windows, "a_start", "a_end", "b_start", "b_end",
        on=("user_id", "p_user"), bucket_width_s=6 * 3600, how="leftsemi",
    ).count()
    assert semi == semi_naive


def test_bucketed_interval_join_is_hash_join(spark, sf_dir):
    daily, windows = _intervals(spark, sf_dir)
    out = interval_overlap_join(
        daily, windows, "a_start", "a_end", "b_start", "b_end",
        on=("user_id", "p_user"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan
