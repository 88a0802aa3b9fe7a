"""Exact distributed order statistics WITHOUT a global sort.

The 100 TB problem: exact median/quantile of a column. `ORDER BY` +
row_number is a full global sort (one massive range exchange);
`percentile()` builds a per-group value buffer (memory ∝ group size).
The classic fix is ITERATIVE BUCKET SELECTION: each pass histograms the
candidate value range into ≤65,536 buckets with ONE partial-aggregated
count pass (map-side combine → at most 65,536 rows cross the wire),
locates the bucket containing the k-th order statistic, and recurses into
it. An integer domain of width W needs ceil(log_65536(W)) + 1 passes — 2
passes for 32-bit-wide domains, 3 for 64-bit — each a plain scan+agg that
Catalyst pushes column pruning into. No sort, no per-group buffers, no
driver data besides the ≤65,536-row histogram.

Semantics: k-th smallest of the multiset (1-indexed), duplicates counted
— `kth_smallest(df, col, ceil(q*n))` is the discrete q-quantile
(percentile_disc). Exact for any integral column; doubles should be
scaled to integers by the caller (e.g. cents) to keep bucket arithmetic
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

BUCKETS = 1 << 16


def kth_smallest(df: DataFrame, col: str, k: int) -> int:
    """Exact k-th smallest (1-indexed) of an integral column; NULLs are
    excluded (SQL ordering semantics). Raises on k out of range."""
    if k < 1:
        raise ValueError("k must be >= 1")
    vals = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("bigint").alias("x")
    )
    head = vals.agg(
        F.min("x"), F.max("x"), F.count(F.lit(1))
    ).first()
    lo, hi, n = head
    if n == 0 or k > n:
        raise ValueError(f"k={k} outside the column's {n} non-null rows")
    lo, hi = int(lo), int(hi)
    remaining = k
    while hi > lo:
        width = hi - lo + 1
        # ceil-div bucket size so bucket ids stay < BUCKETS
        size = -(-width // BUCKETS)
        hist = (
            vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
            .groupBy(F.expr(f"(x - {lo}) div {size}").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        counts = {int(r["b"]): int(r["c"]) for r in hist}
        cum = 0
        for b in sorted(counts):
            if cum + counts[b] >= remaining:
                remaining -= cum
                lo, hi = lo + b * size, min(hi, lo + b * size + size - 1)
                break
            cum += counts[b]
        else:  # pragma: no cover - guarded by the k<=n check
            raise AssertionError("rank ran past the histogram")
        if size == 1:
            return lo
    return lo


def exact_quantile(df: DataFrame, col: str, q: float) -> int:
    """Discrete q-quantile (percentile_disc): the smallest value whose
    rank reaches ceil(q*n). q in (0, 1]."""
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError("no non-null rows")
    k = -(-int(q * 1_000_000 * n) // 1_000_000)  # ceil(q*n) sans fp drift
    return kth_smallest(df, col, max(1, k))


GROUPS_MAX = 100_000


def grouped_quantile(
    df: DataFrame,
    group: str,
    col: str,
    q: float,
) -> "DataFrame":
    """Exact per-group discrete q-quantile, ALL groups refined together:
    each pass is ONE histogram aggregation keyed by (group, bucket) —
    buckets are computed against each group's own candidate range via a
    broadcast bounds table — so the pass count is max-over-groups (2-3
    for integer domains), never #groups. Driver state is one (lo, hi,
    rank) triple per group, bounded by GROUPS_MAX (grouped selection is a
    bounded-group-cardinality operator by contract: per-group results
    must fit on the driver anyway).

    Returns a DataFrame (group, value). NULL values excluded per group;
    groups with only NULLs are absent from the result."""
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    vals = df.filter(F.col(col).isNotNull()).select(
        F.col(group).alias("g"), F.col(col).cast("bigint").alias("x")
    )
    head = (
        vals.groupBy("g")
        .agg(F.min("x"), F.max("x"), F.count(F.lit(1)))
        .collect()
    )
    if len(head) > GROUPS_MAX:
        raise ValueError(
            f"{len(head)} groups exceeds GROUPS_MAX={GROUPS_MAX}"
        )
    state: dict = {}
    for g, lo, hi, n in head:
        k = max(1, -(-int(q * 1_000_000 * int(n)) // 1_000_000))
        state[g] = [int(lo), int(hi), k]
    done: dict = {}
    spark = df.sparkSession
    while state:
        resolved = [g for g, (lo, hi, _) in state.items() if lo == hi]
        for g in resolved:
            done[g] = state.pop(g)[0]
        if not state:
            break
        bounds = spark.createDataFrame(
            [
                (g, lo, hi, -(-(hi - lo + 1) // BUCKETS))
                for g, (lo, hi, _) in state.items()
            ],
            "g_b " + dict(vals.dtypes)["g"] + ", lo bigint, hi bigint, sz bigint",
        )
        hist = (
            vals.join(
                F.broadcast(bounds),
                (vals.g == bounds.g_b)
                & (vals.x >= bounds.lo)
                & (vals.x <= bounds.hi),
            )
            .groupBy("g", F.expr("(x - lo) div sz").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per_group: dict = {}
        for r in hist:
            per_group.setdefault(r["g"], {})[int(r["b"])] = int(r["c"])
        for g, counts in per_group.items():
            lo, hi, k = state[g]
            size = -(-(hi - lo + 1) // BUCKETS)
            cum = 0
            for b in sorted(counts):
                if cum + counts[b] >= k:
                    state[g] = [
                        lo + b * size,
                        min(hi, lo + b * size + size - 1),
                        k - cum,
                    ]
                    break
                cum += counts[b]
    return spark.createDataFrame(
        [(g, v) for g, v in sorted(done.items(), key=lambda t: str(t[0]))],
        "g " + dict(vals.dtypes)["g"] + ", value bigint",
    ).withColumnRenamed("g", group)


def grouped_quantiles(
    df: DataFrame,
    group: str,
    col: str,
    qs: "list[float]",
) -> "DataFrame":
    """Exact per-group quantiles for SEVERAL q at once — the same
    simultaneous refinement as :func:`grouped_quantile`, with state keyed
    by (group, q): every pass is still ONE histogram aggregation, the
    broadcast bounds table carries one row per still-active (group, q)
    pair, and the data-side join fans each row out only to its group's
    active quantile ranges. Pass count stays max-over-targets (2-3 for
    integer domains) regardless of how many quantiles are requested —
    asking for the median and then the quartiles separately would triple
    the scans this shares.

    Returns (group, q, value). q values must be distinct, each in (0, 1]."""
    if len(set(qs)) != len(qs) or not qs:
        raise ValueError("qs must be non-empty and distinct")
    for q in qs:
        if not 0 < q <= 1:
            raise ValueError("each q must be in (0, 1]")
    vals = df.filter(F.col(col).isNotNull()).select(
        F.col(group).alias("g"), F.col(col).cast("bigint").alias("x")
    )
    head = (
        vals.groupBy("g")
        .agg(F.min("x"), F.max("x"), F.count(F.lit(1)))
        .collect()
    )
    if len(head) * len(qs) > GROUPS_MAX:
        raise ValueError(
            f"{len(head)} groups x {len(qs)} quantiles exceeds "
            f"GROUPS_MAX={GROUPS_MAX}"
        )
    g_type = dict(vals.dtypes)["g"]
    state: dict = {}
    for g, lo, hi, n in head:
        for q in qs:
            k = max(1, -(-int(q * 1_000_000 * int(n)) // 1_000_000))
            state[(g, q)] = [int(lo), int(hi), k]
    done: dict = {}
    spark = df.sparkSession
    while state:
        for key in [k for k, (lo, hi, _) in state.items() if lo == hi]:
            done[key] = state.pop(key)[0]
        if not state:
            break
        bounds = spark.createDataFrame(
            [
                (g, float(q), lo, hi, -(-(hi - lo + 1) // BUCKETS))
                for (g, q), (lo, hi, _) in state.items()
            ],
            f"g_b {g_type}, q double, lo bigint, hi bigint, sz bigint",
        )
        hist = (
            vals.join(
                F.broadcast(bounds),
                (vals.g == bounds.g_b)
                & (vals.x >= bounds.lo)
                & (vals.x <= bounds.hi),
            )
            .groupBy("g", "q", F.expr("(x - lo) div sz").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per_key: dict = {}
        for r in hist:
            per_key.setdefault((r["g"], r["q"]), {})[int(r["b"])] = int(r["c"])
        for key, counts in per_key.items():
            lo, hi, k = state[key]
            size = -(-(hi - lo + 1) // BUCKETS)
            cum = 0
            for b in sorted(counts):
                if cum + counts[b] >= k:
                    state[key] = [
                        lo + b * size,
                        min(hi, lo + b * size + size - 1),
                        k - cum,
                    ]
                    break
                cum += counts[b]
    return spark.createDataFrame(
        [
            (g, q, v)
            for (g, q), v in sorted(done.items(), key=lambda t: (str(t[0][0]), t[0][1]))
        ],
        f"g {g_type}, q double, value bigint",
    ).withColumnRenamed("g", group)
