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


@st.composite
def tick_series_with_nulls(draw):
    """Like tick_series but ~1 in 4 ticks carries a NULL value — the
    arrangement the round-3 advisor flagged (a NULL-valued tick that is the
    nearest prev/next must yield NULL, not be skipped)."""
    rows = []
    used = set()
    for i in range(draw(st.integers(2, 16))):
        key = draw(st.integers(0, 1))
        ts = draw(st.integers(0, 120))
        if (key, ts) in used:
            continue
        used.add((key, ts))
        v = (
            None
            if draw(st.booleans()) and draw(st.booleans())
            else float(draw(st.integers(-50, 50))) / 4
        )
        rows.append((i, key, ts, v))
    return rows


_INTERP_ORACLE = f"""
WITH bounds AS (
    SELECT user_id,
           CAST(FLOOR(epoch_us(MIN(ts)) / {STEP_S * 1_000_000}.0) AS BIGINT) + 1 AS s0,
           CAST(FLOOR(epoch_us(MAX(ts)) / {STEP_S * 1_000_000}.0) AS BIGINT) AS s1
    FROM events GROUP BY user_id
), grid AS (
    SELECT user_id, make_timestamp(CAST(s * {STEP_S * 1_000_000} AS BIGINT)) AS grid_ts
    FROM bounds, UNNEST(range(s0, s1 + 1)) t(s)
), pn AS (
    SELECT g.user_id, g.grid_ts,
           (SELECT e.value FROM events e
            WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pv,
           (SELECT epoch_us(e.ts) FROM events e
            WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pt,
           (SELECT e.value FROM events e
            WHERE e.user_id = g.user_id AND e.ts > g.grid_ts
            ORDER BY e.ts, e.event_id LIMIT 1) AS nv,
           (SELECT epoch_us(e.ts) FROM events e
            WHERE e.user_id = g.user_id AND e.ts > g.grid_ts
            ORDER BY e.ts, e.event_id LIMIT 1) AS nt
    FROM grid g
)
SELECT user_id, grid_ts,
       ROUND(COALESCE(pv + (nv - pv) * (CAST(epoch_us(grid_ts) - pt AS DOUBLE)
                                        / CAST(nt - pt AS DOUBLE)), pv), 6) AS interp_value
FROM pn
"""


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tick_series_with_nulls())
def test_resample_interp_null_ticks_equal_duckdb(spark, rows):
    """NULL-valued ticks: Spark must carry the nearest tick as one unit
    (timestamp AND value from the same row, like the oracle's single-row
    subqueries), so a NULL-valued nearest tick yields NULL — pandas skips
    NaNs and is the wrong oracle here, so DuckDB adjudicates."""
    import duckdb

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
    pdf["ts"] = pd.to_datetime(pdf.ts_s, unit="s").astype("datetime64[us]")
    pdf["value"] = pdf["value"].astype("Float64")
    con = duckdb.connect()
    con.register("events", pdf[["event_id", "user_id", "ts", "value"]])
    want = {
        (r[0], int(r[1].timestamp())): (None if r[2] is None else round(r[2], 6))
        for r in con.execute(_INTERP_ORACLE).fetchall()
    }
    con.close()
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, (k, got[k])
        else:
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
