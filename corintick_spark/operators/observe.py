"""Pipeline observability via ``df.observe`` — metrics for free in one pass.

A 100 TB cleaning pipeline needs row-count / drop-rate / quality telemetry
at each stage, but a separate ``count()`` per metric re-runs the plan.
``Observation`` attaches aggregate expressions to a point IN the plan:
they are computed by the same tasks that execute the action (an extra
accumulator per partition, zero extra scans), and the driver reads them
after any action completes. This is the idiomatic Spark replacement for
the ad-hoc stage counters a hand-rolled pipeline would collect().

Contract notes (why the helper exists):
- expressions must be aggregates over the observed point's columns;
- metrics materialize only after an ACTION runs the plan — reading the
  Observation before that blocks;
- observe() sees rows AT ITS POINT in the plan: attach before a filter to
  measure what the filter sees, after it to measure what survived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_metrics(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics at this point of the plan. Returns
    (instrumented df, observation); read ``observation.get`` after an
    action."""
    obs = Observation(name)
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *cols), obs


def instrument_quality_filter(
    df: DataFrame, min_words: int = 10, min_score: float = 0.4
) -> tuple[DataFrame, Observation, Observation]:
    """The observed version of the pipeline_clean_corpus front end: quality
    filter with before/after telemetry (input rows, null-text rows, kept
    rows, kept token mass) collected in the SAME pass that computes the
    result."""
    import pyspark.sql.functions as F

    from corintick_spark.operators.text import quality_features

    scored = quality_features(df)
    before, obs_in = observe_metrics(
        scored,
        "quality_in",
        n_in=F.count(F.lit(1)),
        n_null_text=F.count(F.when(F.col("text").isNull(), 1)),
    )
    kept = before.filter(
        (F.col("n_words") >= min_words) & (F.col("quality_score") >= min_score)
    )
    out, obs_kept = observe_metrics(
        kept,
        "quality_kept",
        n_kept=F.count(F.lit(1)),
        kept_words=F.sum("n_words"),
    )
    return out, obs_in, obs_kept
