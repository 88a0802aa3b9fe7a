"""Custom stateful streaming operator — T-B43's "custom state" tier.

Beyond built-in dedup/session windows, arbitrary per-key state machines use
``applyInPandasWithState`` (GroupState + Arrow batches). The example
processor maintains per-user running statistics (count, exact scaled sum,
min/max, last-seen timestamp) across micro-batches — the streaming analogue
of corintick's per-uid incremental appends (api.py::Corintick.write †
appending chunks per uid): state lives in the executor state store keyed by
uid, scales horizontally, survives restarts via checkpoint.

(Spark 4 also offers transformWithStateInPandas; it requires protobuf on the
Python workers, which this container lacks, so the GroupState API — same
semantics, stable since 3.4 — is used.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, scaled_sum long, vmin double, vmax double, last_us long"
OUTPUT_SCHEMA = (
    "user_id long, n long, total_value double, vmin double, vmax double, last_us long"
)


def _update_running_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold incoming batches for one uid into persistent running stats and
    emit the updated snapshot (one row per uid per micro-batch)."""
    if state.exists:
        n, ssum, vmin, vmax, last_us = state.get
    else:
        n, ssum, vmin, vmax, last_us = 0, 0, None, None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        # SQL aggregate semantics: COUNT(*) counts every row, SUM/MIN/MAX
        # skip NULLs (NaN here) — and the int64 cast would raise on NaN
        vals = pdf["value"].dropna()
        n += len(pdf)
        if len(vals):
            # exact scaled-long accumulation (order-independent; see exact.py)
            ssum += int((vals * 1_000_000).round().astype("int64").sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        bl = int(pdf["ts_us"].max())
        last_us = bl if last_us is None else max(last_us, bl)
    state.update((n, ssum, vmin, vmax, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            # SUM over zero observed values is NULL, not 0 (vmin is the
            # has-any-observation flag)
            "total_value": [ssum / 1_000_000 if vmin is not None else None],
            "vmin": [vmin],
            "vmax": [vmax],
            "last_us": [last_us],
        }
    )


def running_stats(stream_df: DataFrame) -> DataFrame:
    """Apply the per-uid running-stats state machine to an events stream
    (expects columns user_id, value, ts with ts as timestamp)."""
    import pyspark.sql.functions as F

    prepared = stream_df.select(
        "user_id", "value", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_running_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_STATE_SCHEMA = "last_us long"
THROTTLE_OUTPUT_SCHEMA = "user_id long, event_id long"


def _throttle_batch(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Greedy per-key rate limit across micro-batches: keep an event iff
    >= `gap` has passed since the last KEPT event (state = its timestamp).
    With a chronological replay (events_stream_batched) the emitted set
    equals the batch events_throttle fold exactly — the stream/batch
    parity Structured Streaming promises. The per-row decision is a
    sequential scan, so rows are folded in a tight loop over numpy arrays
    (no vectorization exists for a chain recurrence)."""
    gap = 1_800_000_000  # 30 min in µs
    last = state.get[0] if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        yield pd.DataFrame({"user_id": [], "event_id": []}).astype("int64")
        return
    pdf = pd.concat(frames, ignore_index=True).sort_values(["ts_us", "event_id"])
    kept = []
    for tus, eid in zip(pdf["ts_us"].to_numpy(), pdf["event_id"].to_numpy()):
        if last is None or tus - last >= gap:
            kept.append(eid)
            last = int(tus)
    if last is not None:
        state.update((last,))
    yield pd.DataFrame(
        {"user_id": [key[0]] * len(kept), "event_id": kept}, dtype="int64"
    )


def throttle(stream_df: DataFrame) -> DataFrame:
    """Apply the greedy 30-min throttle state machine to an events stream
    (expects user_id, event_id, ts)."""
    import pyspark.sql.functions as F

    prepared = stream_df.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _throttle_batch,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: mergeable Misra-Gries summaries per token shard.
# ---------------------------------------------------------------------------

MG_STATE_SCHEMA = "toks array<string>, cnts array<long>, n_seen long"
MG_OUTPUT_SCHEMA = "shard int, token string, est_count long, shard_n long"


def make_mg_processor(k: int):
    """Per-shard Misra-Gries state machine with capacity ``k``.

    The merge step is the ORDER-FREE mergeable-summaries formulation
    (Agarwal et al., "Mergeable Summaries"): exact value_counts of the
    incoming Arrow batch are added into the stored summary; if more than k
    counters remain, every counter is reduced by the (k+1)-th largest
    count and non-positive ones are dropped. Unlike textbook one-at-a-time
    MG (whose evictions depend on arrival order), this is deterministic
    for ANY row order inside the micro-batch — only the batch BOUNDARIES
    matter, and the chronological replay fixes those. Guarantee: a token's
    estimate undercounts its true shard frequency by at most
    shard_tokens/(k+1), so every token with frequency above that bound
    survives in the summary.

    State is three columns (token array, count array, running token
    total): bounded at k entries per shard forever — the whole point; the
    state store never scales with vocabulary size.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, n_seen = state.get
            counters = dict(zip(toks, (int(c) for c in cnts)))
            n_seen = int(n_seen)
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf["token"].value_counts()
            n_seen += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # (k+1)-th largest count, ties broken by token so the
                # truncation threshold is deterministic
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        ordered = sorted(counters.items(), key=lambda tc: (-tc[1], tc[0]))
        state.update(
            ([t for t, _ in ordered], [c for _, c in ordered], n_seen)
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(ordered),
                "token": [t for t, _ in ordered],
                "est_count": [c for _, c in ordered],
                "shard_n": [n_seen] * len(ordered),
            }
        )

    return fn


def heavy_hitters(stream_df: DataFrame, k: int = 20, shards: int = 8) -> DataFrame:
    """Streaming token heavy hitters with bounded state.

    ``stream_df`` must carry a ``token`` string column. Tokens are hash-
    sharded so each shard owns a disjoint vocabulary slice (summaries
    never overlap) and the k-counter state parallelizes; every shard folds
    its slice across micro-batches via the mergeable MG processor. Total
    streaming state = shards*k counters, independent of vocabulary size —
    the property that makes this viable on an unbounded 100 TB stream
    where exact streaming counts (stream_counts' shape) would grow state
    per distinct key.
    """
    import pyspark.sql.functions as F

    prepared = stream_df.select(
        F.pmod(F.xxhash64("token"), F.lit(shards)).cast("int").alias("shard"),
        "token",
    )
    return prepared.groupBy("shard").applyInPandasWithState(
        make_mg_processor(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
