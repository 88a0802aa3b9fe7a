"""Time-series resampling: irregular ticks → OHLC bars.

The core tick-store downsampling corintick users did in pandas after read
(`df.resample('1H').ohlc()` on the frame returned by api.py::Corintick.read †,
SURVEY.md T-B26). In-engine it is one hash aggregation — partial aggregates
map-side, so a 100 TB events table reduces before the shuffle; no windows,
no sort.

Determinism: open/close use min_by/max_by over a (ts, tiebreak) struct so
ties at equal µs timestamps resolve identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from corintick_spark.exact import dsum


def resample_ohlc(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    freq: str = "hour",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key per-bucket OHLC + volume + exact sum."""
    order: Column = F.struct(F.col(ts), F.col(tiebreak))
    return (
        df.groupBy(F.col(key), F.date_trunc(freq, F.col(ts)).alias("bucket"))
        .agg(
            F.min_by(F.col(value), order).alias("open"),
            F.max(F.col(value)).alias("high"),
            F.min(F.col(value)).alias("low"),
            F.max_by(F.col(value), order).alias("close"),
            F.count("*").alias("n_ticks"),
            dsum(value, "total_value"),
        )
    )


def _floordiv_us(ts_col: Column, step_us: int) -> Column:
    """Exact floor division of epoch-µs by a positive step, as int64.

    (a - pmod(a, b)) is exactly divisible by b and the quotient magnitude
    (a slot index) is far below 2^53, so the double division is exact.
    A plain cast('long') truncates toward zero, which disagrees with the
    DuckDB oracle's `//` (floor) for pre-1970 (negative-epoch) timestamps.
    """
    a = F.unix_micros(ts_col)
    return ((a - F.pmod(a, F.lit(step_us))) / step_us).cast("long")


def _slots(step_us: int):
    """Grid slot indices for a key's (_t0, _t1) span: first slot strictly
    after _t0, last slot at/before _t1. Guarded for spans shorter than one
    step — Spark's sequence(a, b) DESCENDS when a > b (DuckDB's range is
    empty there), which would invent bogus grid points; found by the
    hypothesis differential in tests/test_property_interp.py."""
    s0 = _floordiv_us(F.col("_t0"), step_us) + 1
    s1 = _floordiv_us(F.col("_t1"), step_us)
    return F.when(s0 <= s1, F.sequence(s0, s1)).otherwise(
        F.lit(None).cast("array<long>")
    )


def resample_ffill(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    step_s: int = 3600,
) -> DataFrame:
    """Gap-filled regular grid per key: one row every `step_s` seconds from
    the key's first to last tick, carrying the last observed value forward
    (the pandas `resample().ffill()` idiom corintick users ran client-side †).

    Plan: per-key bounds (one agg) -> sequence() explode builds the grid
    (no driver loop) -> union grid with ticks -> one window pass carries
    last-tick values onto grid rows. Two shuffles total (bounds agg + window),
    both on the key.

    The carried value is the whole latest tick (a struct), not a
    NULL-skipping last() over the value column: a tick whose value is NULL
    must yield a NULL fill (the oracle's single-row `ORDER BY ts DESC,
    event_id DESC LIMIT 1` subquery does), not silently reach past it to an
    older tick. The `_tie` column (event_id when present) makes the pick
    among equal-timestamp ticks deterministic and oracle-identical.
    """
    step_us = step_s * 1_000_000
    tiebreak = "event_id" if "event_id" in df.columns else None
    bounds = df.groupBy(key).agg(
        F.min(ts).alias("_t0"), F.max(ts).alias("_t1")
    )
    grid = bounds.select(
        F.col(key),
        F.explode(_slots(step_us)).alias("_slot"),
    ).select(
        F.col(key),
        F.timestamp_micros(F.col("_slot") * step_us).alias("grid_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(None).cast("long").alias("_tie"),
    )
    ticks = df.select(
        F.col(key),
        F.col(ts).alias("grid_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(value).alias("_v"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tie"),
    )
    unioned = grid.unionByName(ticks)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("grid_ts"), F.col("_is_grid"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tick = F.when(F.col("_is_grid") == 0, F.struct(F.col("_v")))
    filled = unioned.select(
        F.col(key),
        "grid_ts",
        "_is_grid",
        F.last(tick, ignorenulls=True).over(w)["_v"].alias("ffill_value"),
    )
    return filled.filter(F.col("_is_grid") == 1).select(
        key, "grid_ts", "ffill_value"
    )


def resample_interp(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    step_s: int = 3600,
) -> DataFrame:
    """Linearly-interpolated regular grid per key (the pandas
    ``resample().interpolate('time')`` idiom corintick users ran client-side †).

    Semantics: for each grid instant g, prev = latest tick with ts <= g,
    next = earliest tick with ts > g; value = pv + (nv-pv)·(g-pt)/(nt-pt).
    A tick exactly on the grid makes the fraction 0 (exact passthrough);
    a grid point at the key's last tick has no strictly-later next and
    falls back to pv. Same plan shape as resample_ffill — grid via
    sequence()+explode, then ONE window pass over (key) ordered by
    (grid_ts, _is_grid) scanning both directions; ticks sort before grid
    rows at equal instants, which encodes the <=/> tie rule for both the
    preceding and following frames simultaneously.

    Determinism: the fraction is an int64-µs ratio and pv/nv are the raw
    tick doubles, so the final expression is the same IEEE arithmetic in
    any engine; rounded to 6dp for the oracle contract.
    """
    step_us = step_s * 1_000_000
    tiebreak = "event_id" if "event_id" in df.columns else None
    bounds = df.groupBy(key).agg(F.min(ts).alias("_t0"), F.max(ts).alias("_t1"))
    grid = bounds.select(
        F.col(key),
        F.explode(_slots(step_us)).alias("_slot"),
    ).select(
        F.col(key),
        F.timestamp_micros(F.col("_slot") * step_us).alias("grid_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(None).cast("long").alias("_tus"),
        F.lit(None).cast("long").alias("_tie"),
    )
    ticks = df.select(
        F.col(key),
        F.col(ts).alias("grid_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(value).alias("_v"),
        F.unix_micros(F.col(ts)).alias("_tus"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tie"),
    )
    unioned = grid.unionByName(ticks)
    # ticks before grid rows at equal instants (encodes the <=/> tie rule);
    # among equal-ts ticks, _tie makes prev/next picks deterministic.
    # The "next" direction is a running last() over the REVERSED ordering,
    # not a first() over an (currentRow, unboundedFollowing) frame: both
    # directions then stream O(n) accumulators, where the following-frame
    # form re-evaluates its aggregate per row (measured 2-3x slower at
    # sf0.1). DESC on (_is_grid, _tie) preserves the exact tie rule: at an
    # equal instant the reverse scan sees the grid row before its ticks, so
    # "next" stays strictly-after.
    fwd = Window.partitionBy(key).orderBy(
        F.col("grid_ts"), F.col("_is_grid"), F.col("_tie")
    )
    rev = Window.partitionBy(key).orderBy(
        F.col("grid_ts").desc(), F.col("_is_grid").desc(), F.col("_tie").desc()
    )
    prev = fwd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nxt = rev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Carry each direction's pick as ONE struct (the whole tick), mirroring
    # the oracle's single-row prev/next subqueries: a NULL-VALUED tick still
    # IS the nearest tick — four independent ignorenulls last() calls would
    # take its timestamp but reach past it for the value, producing an
    # internally inconsistent (pt from one tick, pv from another) interpolation.
    tick = F.when(F.col("_is_grid") == 0, F.struct(F.col("_tus"), F.col("_v")))
    enriched = unioned.select(
        F.col(key),
        "grid_ts",
        "_is_grid",
        F.last(tick, ignorenulls=True).over(prev).alias("_p"),
        F.last(tick, ignorenulls=True).over(nxt).alias("_n"),
    )
    pv, pt = F.col("_p")["_v"], F.col("_p")["_tus"]
    nv, nt = F.col("_n")["_v"], F.col("_n")["_tus"]
    g_us = F.unix_micros(F.col("grid_ts"))
    frac = (g_us - pt).cast("double") / (nt - pt).cast("double")
    interp = pv + (nv - pv) * frac
    return (
        enriched.filter(F.col("_is_grid") == 1)
        .select(
            key,
            "grid_ts",
            F.round(F.coalesce(interp, pv), 6).alias("interp_value"),
        )
    )
