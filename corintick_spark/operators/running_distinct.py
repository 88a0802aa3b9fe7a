"""Running COUNT(DISTINCT) over a window — the collect_set rewrite with
its memory constraint promoted into the operator contract.

Spark's window functions reject ``COUNT(DISTINCT) OVER`` outright; the
engine rewrites it as ``size(collect_set() OVER)``, which stays a single
exchange + sort like any other running window. The catch is state size:
collect_set holds every distinct value seen so far PER ROW's frame, so
the rewrite is only safe when the column's distinct-value cardinality is
bounded (event types, country codes, status enums — not user ids). On an
unbounded column the per-group set grows with the data and the executor
OOMs at scale even though small tests pass.

This module makes that constraint enforceable rather than a comment: the
operator probes ``approx_count_distinct`` (one cheap jvm-side aggregate,
±5% — a guard, not a result) and raises above ``max_distinct``. Callers
with genuinely unbounded columns should switch to the HLL sketch tier
(operators/sketch.py) for approximate running distincts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, WindowSpec
import pyspark.sql.functions as F


def running_distinct_count(
    df: DataFrame,
    col: str,
    window: WindowSpec,
    max_distinct: int | None = 10_000,
) -> Column:
    """A Column computing the running distinct count of ``df[col]`` over
    ``window`` (rows-frame running windows only — the caller supplies the
    spec). Guards: raises ValueError when the column's global approximate
    cardinality exceeds ``max_distinct`` (the collect_set state bound);
    pass ``None`` to opt out explicitly.
    """
    if max_distinct is not None:
        approx = df.agg(
            F.approx_count_distinct(col).alias("c")
        ).first()["c"]
        if approx > max_distinct:
            raise ValueError(
                f"running_distinct_count: column {col!r} has ~{approx} "
                f"distinct values (> {max_distinct}); the collect_set "
                "window rewrite would hold that many values of state per "
                "group — use the HLL sketch tier for unbounded-cardinality "
                "running distincts, or raise max_distinct explicitly"
            )
    return F.size(F.collect_set(col).over(window)).cast("bigint")
