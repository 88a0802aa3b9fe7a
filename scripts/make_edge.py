"""Generate an ADVERSARIAL edge-case dataset at testdata/edge/ (gitignored).

Same schemas/vintage as the driver's testdata (timestamp[us] events), but
content chosen to hit the boundaries a 100 TB corpus will contain and a
60k-row sample won't: empty/whitespace-only documents, single-tick and
sub-grid-span users, tied timestamps, zero-variance series, zero/identical
embedding vectors, orders without lineitems and vice versa. The edge
differential (tests/test_edge_cases.py) runs EVERY oracle-paired registry
query against this dataset in both engines — any divergence is a latent
production bug of the exact kind the resample descending-sequence and
empty-doc fingerprint fixes came from.

Usage: python scripts/make_edge.py
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.001"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "edge")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    # dims verbatim — queries join against them; the adversarial content
    # lives in the fact tables
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet", f"{DST}/{dim}.parquet")

    # ---- events: keep a real slice, append boundary users -------------
    ev = pd.read_parquet(f"{SRC}/events.parquet").head(200).copy()
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    edge_rows = [
        # 9001: single event (windows/lag/autocorr degenerate)
        (90_010, t0 + pd.Timedelta(minutes=90), 9001, "view", 5.0, '{"k": 1}'),
        # 9002: exact-tie timestamps (deterministic tiebreaks must engage)
        (90_020, t0 + pd.Timedelta(hours=2), 9002, "click", 1.25, '{"k": 2}'),
        (90_021, t0 + pd.Timedelta(hours=2), 9002, "view", 2.5, '{"k": 3}'),
        (90_022, t0 + pd.Timedelta(hours=2), 9002, "purchase", -3.75, "{}"),
        # 9003: constant value — zero variance (autocorr/zscore/anomaly guards)
        (90_030, t0 + pd.Timedelta(minutes=10), 9003, "view", 7.0, '{"k": 4}'),
        (90_031, t0 + pd.Timedelta(minutes=70), 9003, "view", 7.0, '{"k": 5}'),
        (90_032, t0 + pd.Timedelta(minutes=130), 9003, "view", 7.0, '{"k": 6}'),
        # 9004: span shorter than the hourly grid step (no grid points)
        (90_040, t0 + pd.Timedelta(minutes=61), 9004, "error", 0.0, '{"k": 7}'),
        (90_041, t0 + pd.Timedelta(minutes=85), 9004, "error", -1.0, "{}"),
        # 9005: extreme magnitudes within the scaled-long budget; a tick
        # exactly ON a grid instant (interp passthrough)
        (90_050, t0 + pd.Timedelta(hours=1), 9005, "signup", 99_999.99, '{"k": 8}'),
        (90_051, t0 + pd.Timedelta(hours=3), 9005, "signup", -99_999.99, '{"k": 9}'),
        # 9006: value 0.0 everywhere (log/division paths)
        (90_060, t0 + pd.Timedelta(minutes=5), 9006, "view", 0.0, '{"k": 10}'),
        (90_061, t0 + pd.Timedelta(minutes=200), 9006, "click", 0.0, "{}"),
        # 9007: NULL value / NULL props — SUM skips, JSON extraction nulls
        (90_070, t0 + pd.Timedelta(minutes=15), 9007, "view", None, None),
        (90_071, t0 + pd.Timedelta(minutes=75), 9007, "view", 3.5, '{"k": 11}'),
        # 9008: epoch-boundary timestamps — 1970 (epoch ~0) and far future;
        # unix_micros/make_timestamp/epoch_us round-trips must agree
        (90_080, pd.Timestamp("1970-01-01 00:00:01"), 9008, "view", 1.0, "{}"),
        (90_081, pd.Timestamp("1970-01-01 01:30:00"), 9008, "view", 2.0, "{}"),
        (90_082, pd.Timestamp("2099-12-31 23:00:00"), 9009, "click", 4.0, "{}"),
        (90_083, pd.Timestamp("2099-12-31 23:59:59"), 9009, "click", 8.0, "{}"),
        # 9010: NULL-valued tick is the LATEST prev before a grid point
        # (v=1.0@0:10, NULL@0:50, v=2.0@1:30) — interpolation/ffill at 1:00
        # must yield NULL (the tick is real, its value is not), not reach
        # past to the 0:10 tick. The exact arrangement of the round-3
        # advisor finding on resample_interp.
        (90_100, t0 + pd.Timedelta(minutes=10), 9010, "view", 1.0, "{}"),
        (90_101, t0 + pd.Timedelta(minutes=50), 9010, "view", None, "{}"),
        (90_102, t0 + pd.Timedelta(minutes=90), 9010, "view", 2.0, "{}"),
        # 9011: pre-1970 timestamps — NEGATIVE epoch micros. Slot math must
        # floor (// in DuckDB), not truncate toward zero; a cast('long')
        # after double division is off by one slot here.
        (90_110, pd.Timestamp("1969-12-31 20:15:00"), 9011, "view", 10.0, "{}"),
        (90_111, pd.Timestamp("1969-12-31 23:45:00"), 9011, "view", 20.0, "{}"),
        # 9012: DST-transition instants (US spring-forward 2024-03-10,
        # fall-back 2024-11-03, EU 2024-03-31). Timestamps are naive µs and
        # both engines run UTC, so results must be invariant — this class
        # guards against any local-time function sneaking into date math.
        (90_120, pd.Timestamp("2024-03-10 01:59:59"), 9012, "view", 1.0, "{}"),
        (90_121, pd.Timestamp("2024-03-10 02:30:00"), 9012, "view", 2.0, "{}"),
        (90_122, pd.Timestamp("2024-03-10 03:00:01"), 9012, "click", 3.0, "{}"),
        (90_123, pd.Timestamp("2024-11-03 01:30:00"), 9012, "click", 4.0, "{}"),
        (90_124, pd.Timestamp("2024-03-31 02:30:00"), 9012, "view", 5.0, "{}"),
    ]
    edge = pd.DataFrame(
        edge_rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev = pd.concat([ev, edge], ignore_index=True)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    # nullable dtype so the None row lands as parquet NULL, not float NaN
    ev["value"] = ev["value"].astype("Float64")
    # tiny row groups: the ~230-row file spans >4 parquet row groups, so
    # every scan crosses row-group boundaries (statistics pruning, batch
    # reassembly) — the shape a 100 TB multi-row-group file always has
    ev.to_parquet(f"{DST}/events.parquet", index=False, row_group_size=50)

    # ---- documents: empty/degenerate texts ----------------------------
    d = pd.read_parquet(f"{SRC}/documents.parquet").head(60).copy()
    edge_docs = [
        (9001, "", "en", "edge", 0),                          # empty
        (9002, "   ", "en", "edge", 3),                       # whitespace only
        (9003, "x", "en", "edge", 1),                         # single short token
        (9004, "dup dup dup dup dup dup dup dup", "en", "edge", 31),  # repetition
        (9005, ".,;:!?", "en", "edge", 6),                    # punctuation only
        (9006, "a " * 400, "en", "edge", 800),                # long, tiny tokens
        (9007, d.iloc[0]["text"], d.iloc[0]["lang"], "edge", int(d.iloc[0]["n_chars"])),  # exact dup of a real doc
        (9008, "null lang doc", None, None, 13),              # NULL lang/source
        (9009, None, "en", "edge", 0),                        # NULL text
        # unicode: CJK (no spaces — one giant token), accents, emoji,
        # combining marks; length() must count codepoints identically and
        # the utf-8 byte payloads must agree across engines
        (9010, "数据处理引擎 très bien 🚀🚀 naïve café", "zh", "edge", 23),
        (9011, "étude résumé (combining accents)", "fr", "edge", 30),
        # giant document: ~20k tokens over a 997-word vocabulary — the
        # long-tail doc a 100 TB crawl always contains; stresses shingle
        # explosion (contamination/boilerplate 5-grams), prefix-sum packing
        # (spans many 4096-token windows), perplexity joins, heavy hitters
        (9012, " ".join(f"w{i % 997}tok{i % 31}" for i in range(20_000)), "en", "edge", 0),
        # pathological repetition at scale: ONE word 30k times — a single
        # n/1 vocabulary entry (heavy-hitter magnet, zero-entropy LM doc,
        # constant shingles)
        (9013, "spam " * 30_000, "en", "edge", 0),
    ]
    d = pd.concat(
        [d, pd.DataFrame(edge_docs, columns=["doc_id", "text", "lang", "source", "n_chars"])],
        ignore_index=True,
    )
    d.to_parquet(f"{DST}/documents.parquet", index=False)

    # ---- embeddings: zero vector, identical vectors, negatives --------
    e = pd.read_parquet(f"{SRC}/embeddings.parquet").head(60).copy()
    dim = len(e.iloc[0]["embedding"])
    zero = np.zeros(dim, dtype=np.float32)
    ones = np.ones(dim, dtype=np.float32) / np.sqrt(dim)
    neg = -ones
    edge_vecs = [
        (9001, zero, 0),     # zero norm (cosine guards)
        (9002, ones, 1),
        (9003, ones.copy(), 1),   # identical pair (near-dup must fire)
        (9004, neg, 2),      # anti-parallel
    ]
    e = pd.concat(
        [e, pd.DataFrame(edge_vecs, columns=["vec_id", "embedding", "label"])],
        ignore_index=True,
    )
    e.to_parquet(f"{DST}/embeddings.parquet", index=False)

    # ---- orders/lineitem: referential edges ---------------------------
    o = pd.read_parquet(f"{SRC}/orders.parquet").head(300).copy()
    li = pd.read_parquet(f"{SRC}/lineitem.parquet")
    li = li[li.l_orderkey.isin(o.o_orderkey)].head(800).copy()
    # an order with NO lineitems (outer-join edge)
    lonely = o.iloc[[0]].copy()
    lonely["o_orderkey"] = 9_900_001
    o = pd.concat([o, lonely], ignore_index=True)
    # a lineitem with NO order (anti-join edge), zero qty/price/discount=1
    orphan = li.iloc[[0]].copy()
    orphan["l_orderkey"] = 9_900_002
    orphan["l_quantity"] = 0.0
    orphan["l_extendedprice"] = 0.0
    orphan["l_discount"] = 1.0
    li = pd.concat([li, orphan], ignore_index=True)
    for c in ("o_orderdate",) if "o_orderdate" in o.columns else ():
        o[c] = o[c].astype("datetime64[us]")
    if "l_shipdate" in li.columns:
        li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    o.to_parquet(f"{DST}/orders.parquet", index=False)
    li.to_parquet(f"{DST}/lineitem.parquet", index=False)
    print(f"edge dataset written to {DST}")


if __name__ == "__main__":
    main()
