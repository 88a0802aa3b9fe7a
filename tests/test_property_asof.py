"""Property-based differential tests (hypothesis): the distributed as-of
join must equal pandas.merge_asof on arbitrary irregular series — including
duplicate timestamps, empty sides, and single-key data. This mirrors the
reference's pandas-as-oracle test philosophy (SURVEY.md §5) with generated
rather than fixed inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def series_frames(draw):
    n_keys = draw(st.integers(1, 3))
    n_left = draw(st.integers(0, 25))
    n_right = draw(st.integers(0, 25))

    def rows(n, start_id):
        out = []
        for i in range(n):
            key = draw(st.integers(0, n_keys - 1))
            # second-granularity ts with deliberate collision chances
            ts = draw(st.integers(0, 40))
            val = draw(st.integers(-5, 5))
            out.append((start_id + i, key, ts, float(val)))
        return out

    return rows(n_left, 0), rows(n_right, 1000)


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series_frames())
def test_asof_equals_merge_asof(spark, data):
    from corintick_spark.operators.asof import asof_join

    left_rows, right_rows = data
    schema = "event_id long, user_id long, ts_s long, value double"
    left = spark.createDataFrame(left_rows or [], schema=schema).withColumn(
        "ts", pd_ts("ts_s")
    )
    right = spark.createDataFrame(right_rows or [], schema=schema).withColumn(
        "ts", pd_ts("ts_s")
    )
    got = (
        asof_join(
            left.select("event_id", "user_id", "ts"),
            right.select("user_id", "ts", "event_id", "value"),
            on="user_id",
            ts="ts",
            right_cols=["value"],
            tiebreak="event_id",
            prefix="r_",
        )
        .select("event_id", "r_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts_s", "value"])
    rp = pd.DataFrame(right_rows, columns=["event_id", "user_id", "ts_s", "value"])
    if len(lp) == 0:
        assert len(got) == 0
        return
    if len(rp) == 0:
        assert len(got) == len(lp)
        assert got["r_value"].isna().all()
        return
    # pandas merge_asof needs sort; for duplicate ts, keep the LAST right row
    # by (ts, event_id) — the asof_join contract.
    rp = rp.sort_values(["ts_s", "event_id"])
    lp = lp.sort_values(["ts_s", "event_id"])
    expected = pd.merge_asof(
        lp.astype({"ts_s": "int64"}),
        rp[["user_id", "ts_s", "value"]].astype({"ts_s": "int64"}),
        on="ts_s",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_r"),
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(expected)
    pd.testing.assert_series_equal(
        got["r_value"], expected["value_r"], check_names=False
    )


def pd_ts(col: str):
    import pyspark.sql.functions as F

    return F.timestamp_seconds(F.col(col))



@pytest.mark.slow
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),        # key
            st.integers(0, 10_000),   # ts seconds
            st.integers(-100, 100),   # value
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resample_equals_pandas(spark, rows):
    """resample_ohlc == pandas groupby-hour OHLC on arbitrary tick sets."""
    from corintick_spark.operators.resample import resample_ohlc

    data = [(i, k, ts, float(v)) for i, (k, ts, v) in enumerate(rows)]
    df = (
        spark.createDataFrame(data, "event_id long, user_id long, ts_s long, value double")
        .withColumn("ts", pd_ts("ts_s"))
    )
    got = (
        resample_ohlc(df, key="user_id", ts="ts", value="value", freq="hour")
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(data, columns=["event_id", "user_id", "ts_s", "value"])
    pdf["bucket"] = pd.to_datetime(pdf["ts_s"] // 3600 * 3600, unit="s")
    pdf = pdf.sort_values(["ts_s", "event_id"])
    exp = (
        pdf.groupby(["user_id", "bucket"])
        .agg(
            open=("value", "first"),
            high=("value", "max"),
            low=("value", "min"),
            close=("value", "last"),
            n_ticks=("value", "size"),
        )
        .reset_index()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ("open", "high", "low", "close"):
        pd.testing.assert_series_equal(
            got[col], exp[col], check_names=False, check_dtype=False
        )
    pd.testing.assert_series_equal(
        got["n_ticks"].astype("int64"), exp["n_ticks"].astype("int64"), check_names=False
    )



@pytest.mark.slow
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_frames(), st.sampled_from(["forward", "nearest"]),
       st.sampled_from([None, 5_000_000]))
def test_asof_directions_equal_merge_asof(spark, data, direction, tol_us):
    from corintick_spark.operators.asof import asof_join

    left_rows, right_rows = data
    schema = "event_id long, user_id long, ts_s long, value double"
    left = spark.createDataFrame(left_rows or [], schema=schema).withColumn("ts", pd_ts("ts_s"))
    right = spark.createDataFrame(right_rows or [], schema=schema).withColumn("ts", pd_ts("ts_s"))
    got = (
        asof_join(
            left.select("event_id", "user_id", "ts"),
            right.select("user_id", "ts", "event_id", "value"),
            on="user_id", ts="ts", right_cols=["value"], tiebreak="event_id",
            prefix="r_", direction=direction, tolerance_us=tol_us,
        )
        .select("event_id", "r_value")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts_s", "value"])
    rp = pd.DataFrame(right_rows, columns=["event_id", "user_id", "ts_s", "value"])
    if len(lp) == 0:
        assert len(got) == 0
        return
    if len(rp) == 0:
        assert got["r_value"].isna().all()
        return
    # pandas tiebreak convention among equal-ts right rows: backward takes
    # the LAST in input order, forward takes the FIRST. Our operator picks
    # max event_id (backward) / min event_id (forward) — so a plain
    # ascending (ts, event_id) input sort aligns both conventions.
    rp = rp.sort_values(["ts_s", "event_id"])
    lp = lp.sort_values(["ts_s", "event_id"])
    rp2 = rp
    kwargs = dict(on="ts_s", by="user_id", direction=direction,
                  allow_exact_matches=True, suffixes=("", "_r"))
    if tol_us is not None:
        kwargs["tolerance"] = tol_us // 1_000_000  # ts_s is in seconds
    expected = pd.merge_asof(
        lp.astype({"ts_s": "int64"}),
        rp2[["user_id", "ts_s", "value"]].astype({"ts_s": "int64"}),
        **kwargs,
    ).sort_values("event_id").reset_index(drop=True)
    if direction == "nearest":
        # merge_asof nearest tie-break (backward-vs-forward at equal
        # distance) matches ours: backward wins. Same-side equal-ts ties are
        # resolved by the pre-sort above.
        pass
    assert len(got) == len(expected)
    pd.testing.assert_series_equal(got["r_value"], expected["value_r"], check_names=False)
