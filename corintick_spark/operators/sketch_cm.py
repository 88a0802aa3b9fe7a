"""Count-Min sketch: mergeable approximate frequency counts as plain
DataFrame aggregation.

Completes the sketch tier (HLL for distinct counts, Misra-Gries for heavy
hitters): CM answers point frequency queries over an unbounded key domain
in fixed space — depth*width int64 counters — with one-sided error
(estimates NEVER undercount; overcount <= e*N/width with probability
1 - e^-depth per query). The sketch is a (row, bucket, count) DataFrame:
building it is one hash aggregation (each input row contributes `depth`
cells), merging two sketches is union + sum (counters are additive, so
merge is EXACT — sketch(A ++ B) == merge(sketch(A), sketch(B)) cell for
cell), and estimation is an equi-join of the probe items against their
depth cells followed by a min. All hashing is xxhash64 with fixed integer
seeds — deterministic across runs, sessions, and engines.

At 100 TB: the build is a map-side-combinable groupBy on (row, bucket) —
at most depth*width distinct groups regardless of input size — and the
sketch table (e.g. 4x8192 = 32k rows) broadcasts anywhere. This is the
shape to maintain per partition/day and roll up exactly by summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def cm_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Build the sketch: (j, bucket, cnt) with exactly one cell per (input
    row, j). NULL keys are skipped (SQL COUNT semantics)."""
    cells = df.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}),"
                f" j -> struct(j, pmod(xxhash64({col}, j), {width}) AS bucket))"
            )
        ).alias("c")
    )
    return (
        cells.select(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact sketch merge: cell-wise sum (counters are additive)."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point estimates per DISTINCT value of ``items[col]``: est = min
    over the value's depth cells (absent cell -> 0). Returns exactly one
    row per distinct non-null probe value with schema ``(col,
    est_count)`` — duplicate probe rows collapse and other columns of
    ``items`` are dropped (join the result back on ``col`` to re-attach
    them). The sketch side is depth*width rows at most — Spark broadcasts
    it, so the probe never shuffles."""
    probes = items.filter(F.col(col).isNotNull()).select(col).distinct().select(
        F.col(col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}),"
                f" j -> struct(j, pmod(xxhash64({col}, j), {width}) AS bucket))"
            )
        ).alias("c"),
    ).select(col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
