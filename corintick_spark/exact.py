"""Float-determinism helpers for oracle-checked aggregates.

Summing doubles is order-dependent; Spark's partial aggregation order differs
run-to-run and from DuckDB's, so `SUM(double)` can differ in the last ulps —
enough to break an exact value-hash comparison. Two exact (order-independent)
strategies:

- **scaled-long (default)**: round(value·10⁶) summed as int64, final result
  divided back as double. Long sums stay in whole-stage codegen — ~2× the
  cost of a plain double sum and ~2× faster than decimal accumulation.
  Overflow budget: |value|·10⁶·rows_per_group < 2⁶³ ≈ 9.2e18 — with values
  ≤1e6 that is ~9e6 rows per aggregation group per 1e6 of magnitude (plenty
  for the bench scales; both engines agree bit-for-bit because the long→
  double conversion and the division are IEEE-defined on identical inputs).
- **decimal(38,6) (wide)**: exact up to 38 digits — the 100 TB-safe path for
  aggregations whose per-group row counts or magnitudes can exceed the
  scaled-long budget. ~4× a double sum; use when the data demands it.

Tie-rounding of value·10⁶ at exact .5 midpoints: Spark HALF_UP and C round()
both round away from zero for the same sign, so even the (measure-zero)
dyadic ties agree.

Input contract: NULL values are fine (round(NULL) is NULL and both engines'
SUM skips it — verified by the edge-dataset sweep), but NaN is not: casting
NaN to BIGINT aborts in BOTH engines (Spark ANSI CAST_INVALID_INPUT, DuckDB
conversion error). A pipeline whose doubles can be NaN must scrub them to
NULL first (`nanvl(x, NULL)` / `CASE WHEN isnan(x) THEN NULL END`) — kept
out of the hot path here because the scrub costs a branch per row and real
tick/price feeds emit NULLs, not NaNs.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

DEC = "decimal(38,6)"
SCALE = 1_000_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def q6(col: Column) -> Column:
    """Repr-independent 6-decimal quantization: floor(x·10⁶)/10⁶.

    ROUND(x, 6) is NOT portable on doubles near a decimal midpoint: Spark
    rounds the value's SHORTEST decimal repr (BigDecimal.valueOf →
    "…8.0046875" → HALF_UP → …688) while DuckDB rounds the true binary
    expansion (…74999… → …687) — observed live at sf0.1 on
    window_pct_change. floor() sees only the double itself, so both engines
    agree bit-for-bit. Mirror in SQL with FLOOR(x * 1000000) / 1000000.
    """
    return F.floor(_c(col) * SCALE) / SCALE


def dsum(col: Column | str, alias: str) -> Column:
    """Exact order-independent sum of a double column (scaled-long)."""
    scaled = F.round(_c(col) * SCALE).cast("bigint")
    return (F.sum(scaled).cast("double") / SCALE).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact scaled sum divided by count."""
    scaled = F.round(_c(col) * SCALE).cast("bigint")
    return ((F.sum(scaled).cast("double") / SCALE) / F.count(_c(col))).alias(alias)


def wsum(col: Column | str, window) -> Column:
    """Windowed exact sum (scaled-long accumulation)."""
    scaled = F.round(_c(col) * SCALE).cast("bigint")
    return F.sum(scaled).over(window).cast("double") / SCALE


def dsum_wide(col: Column | str, alias: str) -> Column:
    """Exact sum via DECIMAL(38,6) — for magnitudes/group sizes beyond the
    scaled-long budget (the conservative 100 TB path)."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def DSUM(expr: str, alias: str) -> str:
    """DuckDB-side mirror of ``dsum``."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE} AS {alias}"
    )


def DAVG(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE} / COUNT({expr}) AS {alias}"
    )


def WSUM(expr: str, over: str) -> str:
    return (
        f"CAST(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT)) OVER {over} AS DOUBLE)"
        f" / {SCALE}"
    )


def DSUM_WIDE(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"
