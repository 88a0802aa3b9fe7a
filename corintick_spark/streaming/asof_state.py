"""Streaming as-of enrichment via per-key state — the keyed-state
alternative to the foreachBatch join (VERDICT r04 item 2 named both
shapes; queries/streaming_queries.py::stream_asof is the join, this
module is the state machine).

Semantics: events and purchases arrive in ONE chronologically-batched
stream; each event is enriched with the latest purchase value at-or-before
its timestamp for the same user (inclusive ties, max event_id among
equal-ts purchases — identical to the ASOF-join contract). Because the
micro-batches are time-ordered, per-user state is O(1): only the latest
purchase seen so far — the 100 TB posture for live tick enrichment, where
the foreachBatch variant re-joins the full static quote table per batch
but this one touches just the arriving rows plus |users| state entries.

API note: Spark 4's transformWithStateInPandas is the richer arbitrary-
state API but its Python state server needs protobuf, absent in this
container (same constraint documented in streaming/stateful.py), so this
uses ``applyInPandasWithState`` — GroupState + Arrow batches, stable since
3.4, identical state semantics for a single ValueState-shaped tuple.

Within a batch the group's purchases dedupe to per-instant quotes (max
event_id at equal ts) and a vectorized merge_asof attaches them to every
row — no per-row Python beyond the one pandas pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "event_id long, user_id long, ts_us long, last_purchase_value double"
)
STATE_SCHEMA = "ts_us long, eid long, qv double"


def _enrich_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    pdf = pd.concat(list(pdfs), ignore_index=True)
    if not len(pdf):
        return
    pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort").reset_index(
        drop=True
    )

    # per-instant quote: among equal-ts purchases the max event_id wins
    # (the ASOF oracle's arg_max(value, event_id) dedup); that quote is
    # visible to EVERY row at ts >= its ts — including the other purchases
    # at the same instant
    purchases = pdf[pdf["is_q"] == 1]
    quotes = purchases.groupby("ts_us", sort=True)["value"].last()
    prev = state.get if state.exists else None

    quotes_df = quotes.rename("qv").reset_index()
    # q_ts marks which rows merge_asof actually MATCHED: a matched quote
    # whose value is NULL (all purchases at that instant had NULL value —
    # the oracle's arg_max returns NULL there) must STAY NULL; only rows
    # with NO in-batch quote at-or-before get the carried-in state.
    # fillna on qv alone would conflate the two (both are NaN).
    quotes_df["q_ts"] = quotes_df["ts_us"]
    merged = pd.merge_asof(
        pdf[["event_id", "ts_us"]],
        quotes_df,
        on="ts_us",
        direction="backward",
    )
    qv = merged["qv"]
    if prev is not None:
        qv = qv.mask(merged["q_ts"].isna(), prev[2])  # carry-in
    yield pd.DataFrame(
        {
            "event_id": merged["event_id"].astype("int64"),
            "user_id": np.full(len(merged), key[0], dtype="int64"),
            "ts_us": merged["ts_us"].astype("int64"),
            "last_purchase_value": qv.astype("float64"),
        }
    )

    if len(purchases):
        last = purchases.iloc[-1]  # max (ts, event_id) by the sort
        cand = (int(last["ts_us"]), int(last["event_id"]), float(quotes.iloc[-1]))
        if prev is None or (cand[0], cand[1]) >= (int(prev[0]), int(prev[1])):
            state.update(cand)


def asof_enrich_stream(events: DataFrame) -> DataFrame:
    """Wire a normalized event stream (µs-timestamp `ts`) through the
    stateful as-of enricher. Purchases are both enrichment source and
    enriched rows (a purchase sees itself — inclusive semantics), matching
    the ASOF-join oracle exactly."""
    tagged = events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_q"),
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _enrich_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
