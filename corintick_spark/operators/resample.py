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

from pyspark.sql import Column, DataFrame
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
