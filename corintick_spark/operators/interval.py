"""Interval-overlap join as a range-bucketed equi-join (SURVEY.md §4's
optional-polish item, done as a library operator rather than a Catalyst rule).

A plain interval-overlap join (`a.start <= b.end AND a.end >= b.start`) has
no equi component, so Spark plans a (broadcast) nested-loop join — O(|A|·|B|)
comparisons, a dead end at scale. The rewrite: quantize time into fixed-width
buckets, explode each interval to the buckets it touches, equi-join on the
bucket id (plus any key), then re-apply the exact overlap predicate as a
residual filter and dedupe. Cost becomes O(touched-bucket pairs) with a
plain hash shuffle — the range-partitioned temporal-join technique.

Bucket width trades explode factor against bucket selectivity: pick roughly
the median interval length (wider → fewer bucket rows per interval, more
false candidates per bucket).

Column contract: left and right must have disjoint column names (rename
before calling); duplicate identical rows on the left collapse in the
"leftsemi" variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _bucketize(df: DataFrame, start: str, end: str, width_s: int, out: str) -> DataFrame:
    # FLOOR, not cast (truncation toward zero): keeps buckets uniform across
    # epoch 0 — correctness never depended on it (the residual filter is
    # exact and bucket id is a pure function of time, so overlapping
    # intervals always share a bucket), but floor avoids the double-width
    # bucket straddling 1970 that truncation creates
    w = width_s * 1_000_000
    return df.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start)) / w).cast("long"),
                F.floor(F.unix_micros(F.col(end)) / w).cast("long"),
            )
        ).alias(out),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: tuple[str, str] | None = None,
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows of `left` x `right` whose [start, end] intervals overlap
    (inclusive), optionally also matching the equi key pair `on =
    (left_key, right_key)`. Planned as an equi-join on (key, time bucket)
    with a residual overlap filter — no nested-loop join.
    `how` supports "inner" and "leftsemi".
    """
    lb = _bucketize(left, left_start, left_end, bucket_width_s, "_lbucket")
    rb = _bucketize(right, right_start, right_end, bucket_width_s, "_rbucket")
    cond = F.col("_lbucket") == F.col("_rbucket")
    if on is not None:
        cond = (F.col(on[0]) == F.col(on[1])) & cond
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(left_end) >= F.col(right_start)
    )
    if how == "leftsemi":
        return (
            lb.join(rb, cond & overlap, "leftsemi")
            .drop("_lbucket")
            .dropDuplicates(left.columns)
        )
    return (
        lb.join(rb, cond & overlap, "inner")
        .drop("_lbucket", "_rbucket")
        .dropDuplicates(left.columns + right.columns)
    )
