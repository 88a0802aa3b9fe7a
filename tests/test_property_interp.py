"""Property-based differentials (hypothesis) for the round-3 time-series
ops: resample_interp must equal pandas' time-weighted interpolation on
arbitrary irregular series, and window_ewma must equal pandas ewm on
short series (where the 20-tick bound covers full history). Pandas is the
independent oracle, mirroring the as-of suite's philosophy."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pyspark.sql.functions as F

STEP_S = 10  # small grid step so tiny series produce grid points


@st.composite
def tick_series(draw):
    n_keys = draw(st.integers(1, 2))
    rows = []
    used = set()
    for i in range(draw(st.integers(1, 20))):
        key = draw(st.integers(0, n_keys - 1))
        ts = draw(st.integers(0, 120))
        if (key, ts) in used:  # unique per-key instants (pandas reindex needs them)
            continue
        used.add((key, ts))
        rows.append((i, key, ts, float(draw(st.integers(-50, 50))) / 4))
    return rows


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tick_series())
def test_resample_interp_equals_pandas_time_interpolation(spark, rows):
    from corintick_spark.operators.resample import resample_interp

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    got = {
        (r.user_id, int(r.grid_ts.timestamp())): r.interp_value
        for r in resample_interp(
            df.select("event_id", "user_id", "ts", "value"), step_s=STEP_S
        ).collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s", "value"])
    want = {}
    for key, g in pdf.groupby("user_id"):
        s = (
            g.set_index(pd.to_datetime(g.ts_s, unit="s"))["value"]
            .sort_index()
        )
        lo = int(s.index.min().timestamp()) // STEP_S + 1
        hi = int(s.index.max().timestamp()) // STEP_S
        grid = pd.to_datetime([t * STEP_S for t in range(lo, hi + 1)], unit="s")
        if len(grid) == 0:
            continue
        merged = s.reindex(s.index.union(grid)).interpolate(method="time")
        for t in grid:
            want[(key, int(t.timestamp()))] = round(float(merged[t]), 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), (k, got[k], want[k])


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tick_series())
def test_window_ewma_equals_pandas_on_short_series(spark, rows):
    """Series here are <= 20 ticks per key, so the bounded 20-tick frame
    covers full history and must equal pandas ewm(adjust=False)."""
    from corintick_spark.registry import load_all  # noqa: F401  (style parity)

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    w_rows = (
        df.select("event_id", "user_id", "ts", "value")
        .toPandas()
    )

    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    a = F.collect_list("value").over(w)
    ewma = F.expr(
        "aggregate(slice(a, 2, size(a) - 1), a[0],"
        " (acc, x) -> 0.2D * x + 0.8D * acc)"
    )
    got = {
        r.event_id: r.ewma
        for r in df.select("event_id", "user_id", "ts", "value")
        .select("event_id", "user_id", "ts", a.alias("a"))
        .select("event_id", F.round(ewma, 6).alias("ewma"))
        .collect()
    }

    want = {}
    for _, g in w_rows.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        e = g["value"].ewm(alpha=0.2, adjust=False).mean()
        for eid, v in zip(g.event_id, e):
            want[eid] = round(float(v), 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), (k, got[k], want[k])
