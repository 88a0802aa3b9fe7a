"""As-of join — the canonical tick-store operation.

corintick users did this client-side with ``pandas.merge_asof`` after
``read`` (SURVEY.md T-B12 †); here it is a distributed operator. Spark SQL
has no native ASOF join, so we use the union+window technique:

1. tag left (probe) and right (reference) rows, union them,
2. one window per key ordered by (ts, tag, tiebreak) carries the latest
   right-side values forward via ``last(..., ignoreNulls=True)``,
3. keep only left rows.

Scale properties: a single shuffle on the join key (same as any equi-join),
no point lookups, no crossJoin; skewed keys are handled by AQE. This is the
plan a 1000-executor cluster wants: both inputs hash-partitioned by key,
windows evaluated within partitions after a sort — O(n log n) per key group,
no O(n·m) range probing.

Tie semantics: a right row at exactly ts == left.ts IS visible to that left
row (inclusive as-of, matching pandas merge_asof(direction='backward') and
DuckDB ASOF JOIN's ``>=``). Among right rows with equal ts the winner is
per-direction: ``backward`` takes the largest tiebreak (the last row its
forward scan carries), ``forward`` takes the smallest (the first row its
reverse scan meets — see the inline note in ``asof_join``), and ``nearest``
inherits whichever side supplies the value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same `on`
    key group (left-asof semantics; unmatched left rows get nulls).

    direction: "backward" (right.ts <= left.ts, the default tick-store
               probe), "forward" (right.ts >= left.ts), or "nearest"
               (closer of the two; backward wins exact ties) — matching
               pandas.merge_asof's directions.
    tolerance_us: maximum |left.ts - right.ts| in microseconds; matches
               farther away are nulled out (merge_asof's tolerance).
    right_cols: right columns to carry (default: all non-key, non-ts).
    tiebreak:   right column ordering ties at equal ts (e.g. an id column).
    """
    if direction == "nearest":
        back = asof_join(
            left, right, on, ts, right_cols, tiebreak, "_b_", "backward", tolerance_us
        )
        both = asof_join(
            back, right, on, ts, right_cols, tiebreak, "_f_", "forward", tolerance_us
        )
        keys = [on] if isinstance(on, str) else list(on)
        carried = list(dict.fromkeys(
            [ts]
            + ([tiebreak] if tiebreak else [])
            + (right_cols or [c for c in right.columns if c not in keys and c != ts])
        ))
        b_dist = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"_b_{ts}"))
        f_dist = F.unix_micros(F.col(f"_f_{ts}")) - F.unix_micros(F.col(ts))
        take_backward = F.col(f"_f_{ts}").isNull() | (
            F.col(f"_b_{ts}").isNotNull() & (b_dist <= f_dist)
        )
        out = both.select(
            *left.columns,
            *[
                F.when(take_backward, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(f"{prefix}{c}")
                for c in carried
            ],
        )
        return out

    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != ts]
    carried = [ts] + ([tiebreak] if tiebreak and tiebreak not in right_cols else [])
    carried = list(dict.fromkeys(carried + right_cols))
    forward = direction == "forward"

    # Backward: right rows sort before left at equal ts (tag 0 < 1) so an
    # exact-ts match is visible to last() over the preceding frame. Forward
    # mirrors this: left before right at equal ts, first() over the following
    # frame, tiebreak ascending so the SMALLEST tiebreak wins among equals.
    l_tagged = left.withColumn("_tag", F.lit(1))
    for c in carried:
        l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(ts),
        F.lit(0 if not forward else 2).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged)
    order: list[Column] = [F.col(ts).asc(), F.col("_tag").asc()]
    if tiebreak:
        order.append(
            F.col(f"_r_{tiebreak}").asc_nulls_first()
            if not forward
            else F.col(f"_r_{tiebreak}").asc_nulls_last()
        )
    if forward:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(f"_r_{c}", ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(f"_r_{c}", ignorenulls=True).over(w)  # noqa: E731

    filled = unioned.select(
        *left.columns,
        F.col("_tag"),
        *[pick(c).alias(f"{prefix}{c}") for c in carried],
    )
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_us is not None:
        dist = F.abs(
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{prefix}{ts}"))
        )
        within = F.col(f"{prefix}{ts}").isNotNull() & (dist <= tolerance_us)
        out = out.select(
            *left.columns,
            *[
                F.when(within, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    return out
