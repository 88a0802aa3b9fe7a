"""Keyed-state streaming as-of enrichment (streaming/asof_state.py):
NULL-quote semantics across batches — a matched in-batch quote whose
value is NULL must stay NULL (the ASOF oracle's arg_max returns NULL),
while only genuinely-unmatched rows receive the carried-in state
(ADVICE r05)."""

from __future__ import annotations

import math

import pandas as pd

from corintick_spark.streaming.asof_state import _enrich_group


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("no state")
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _batch(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_us", "value", "is_q"]
    )


def _run(state, rows):
    out = list(_enrich_group((7,), iter([_batch(rows)]), state))
    return out[0].set_index("event_id")["last_purchase_value"]


def test_null_purchase_value_not_overwritten_by_carried_state():
    state = _FakeState()
    # batch 1: one purchase with a real value -> state carries 10.0
    got1 = _run(state, [(1, 7, 1, 10.0, 1)])
    assert got1[1] == 10.0
    assert state.get[2] == 10.0

    # batch 2: event BEFORE the in-batch purchase gets the carried 10.0;
    # the purchase itself has NULL value -> it and every later row see
    # NULL (matched quote, NULL value), NOT the stale 10.0
    got2 = _run(
        state,
        [
            (2, 7, 4, math.nan, 0),
            (3, 7, 5, math.nan, 1),
            (4, 7, 6, math.nan, 0),
        ],
    )
    assert got2[2] == 10.0
    assert math.isnan(got2[3]) and math.isnan(got2[4])
    # state now carries the NULL quote (latest purchase ts=5)
    assert state.get[0] == 5 and math.isnan(state.get[2])

    # batch 3: no in-batch purchase -> carried state is the NULL quote
    got3 = _run(state, [(5, 7, 9, math.nan, 0)])
    assert math.isnan(got3[5])


def test_non_null_later_purchase_still_wins():
    state = _FakeState()
    _run(state, [(1, 7, 1, 10.0, 1)])
    got = _run(
        state,
        [(2, 7, 5, math.nan, 1), (3, 7, 6, 20.0, 1), (4, 7, 7, math.nan, 0)],
    )
    # ts=6 purchase (value 20) is the latest at-or-before ts=7
    assert got[4] == 20.0
    assert state.get[0] == 6 and state.get[2] == 20.0
