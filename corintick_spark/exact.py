"""Float-determinism helpers for oracle-checked aggregates.

Summing doubles is order-dependent; Spark's partial aggregation order differs
run-to-run and from DuckDB's, so `SUM(double)` can differ in the last ulps —
enough to break an exact value-hash comparison. The fix: accumulate in
DECIMAL(38,6) (exact, order-independent) and cast the final result to double.
Both engines round the same double→decimal conversions identically except at
exact decimal-tie midpoints, which cannot occur for non-dyadic doubles.

Use ``dsum``/``DSUM`` for every oracle-checked sum over doubles; plain
``F.sum`` is fine for integers (exact) and for rows-only queries.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def wsum(col: Column | str, window) -> Column:
    """Windowed exact sum (cast to double after decimal accumulation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).over(window).cast("double")


def DSUM(expr: str, alias: str) -> str:
    """DuckDB-side mirror of ``dsum``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def DAVG(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def WSUM(expr: str, over: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) OVER {over} AS DOUBLE)"
