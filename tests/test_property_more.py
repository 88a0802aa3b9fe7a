"""More property-based differentials: interval-join rewrite vs the naive
join on generated interval sets, and Corintick round-trip on generated
frames (NaNs, object dtype, irregular index) — the reference's
serialization guarantees, fuzzed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pyspark.sql.functions as F


@pytest.mark.slow
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(  # left intervals: (key, start_s, length_s)
        st.tuples(st.integers(0, 2), st.integers(0, 50_000), st.integers(0, 20_000)),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50_000), st.integers(0, 20_000)),
        min_size=1,
        max_size=15,
    ),
)
def test_interval_join_equals_naive(spark, lrows, rrows):
    from corintick_spark.operators.interval import interval_overlap_join

    left = spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(lrows)],
        "l_id long, l_key long, s long, e long",
    ).select(
        "l_id",
        "l_key",
        F.timestamp_seconds("s").alias("a_start"),
        F.timestamp_seconds("e").alias("a_end"),
    )
    right = spark.createDataFrame(
        [(1000 + i, k, s, s + d) for i, (k, s, d) in enumerate(rrows)],
        "r_id long, r_key long, s long, e long",
    ).select(
        "r_id",
        "r_key",
        F.timestamp_seconds("s").alias("b_start"),
        F.timestamp_seconds("e").alias("b_end"),
    )
    naive = {
        (r["l_id"], r["r_id"])
        for r in left.join(
            right,
            (left.l_key == right.r_key)
            & (left.a_start <= right.b_end)
            & (left.a_end >= right.b_start),
        ).collect()
    }
    bucketed = {
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "a_start", "a_end", "b_start", "b_end",
            on=("l_key", "r_key"), bucket_width_s=7_000,
        ).collect()
    }
    assert bucketed == naive


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000_000),                     # ts offset seconds
            st.one_of(st.none(), st.floats(-1e6, 1e6)),     # float col w/ nulls
            st.text(alphabet="abcxyz ", min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_corintick_roundtrip_fuzz(spark, tmp_path_factory, rows):
    from corintick_spark.compat import Corintick

    rows = sorted(rows)
    idx = pd.to_datetime([1_600_000_000 + s for s, _, _ in rows], unit="s")
    df = pd.DataFrame(
        {
            "x": [v for _, v, _ in rows],
            "s": [t for _, _, t in rows],
        },
        index=idx,
    )
    # float col must be float even when all-None
    df["x"] = df["x"].astype("float64")
    store = Corintick(spark, str(tmp_path_factory.mktemp("ct")))
    store.write("FUZZ", df, check_overlap=False)
    back = store.read("FUZZ")
    pd.testing.assert_frame_equal(back, df, check_freq=False)


@pytest.mark.slow
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(  # (user, ts_offset_seconds) — ties and dense bursts included
        st.tuples(st.integers(0, 3), st.integers(0, 7200)),
        min_size=1,
        max_size=60,
    )
)
def test_throttle_fold_matches_python_reference(spark, rows):
    """The JVM aggregate() greedy-throttle fold must equal a straight
    Python implementation of the rule (keep iff >= gap since last KEPT)
    on arbitrary event streams — bursts, exact-gap boundaries, ties."""
    gap_s = 600
    data = [
        (i, u, 1_700_000_000 + off) for i, (u, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, tus long")

    lst = F.array_sort(
        F.collect_list(F.struct(F.col("tus"), F.col("event_id")))
    )
    kept = F.expr(
        "aggregate(lst,"
        " named_struct('last', CAST(NULL AS BIGINT),"
        "              'ids', CAST(array() AS ARRAY<BIGINT>)),"
        f" (acc, e) -> IF(acc.last IS NULL OR e.tus - acc.last >= {gap_s},"
        "   named_struct('last', e.tus,"
        "                'ids', array_append(acc.ids, e.event_id)),"
        "   acc),"
        " acc -> acc.ids)"
    )
    got = sorted(
        (r["user_id"], r["event_id"])
        for r in df.groupBy("user_id")
        .agg(lst.alias("lst"))
        .select("user_id", F.explode(kept).alias("event_id"))
        .collect()
    )

    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, u, tus in data:
        by_user.setdefault(u, []).append((tus, eid))
    want = []
    for u, evs in by_user.items():
        last = None
        for tus, eid in sorted(evs):
            if last is None or tus - last >= gap_s:
                want.append((u, eid))
                last = tus
    assert got == sorted(want)
