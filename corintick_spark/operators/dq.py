"""Data-quality verification suite (Deequ-style): declarative checks
compiled into minimal passes.

A 100 TB ingestion pipeline gates every batch on constraint checks —
uniqueness of keys, completeness (null budgets), value ranges, referential
integrity. The naive implementation runs one job per check; at scale that
re-scans the fact table N times. This module compiles all ROW-LEVEL checks
against a table into ONE aggregate pass (conditional aggregates inside a
single hash agg — the same partial/final shape as any groupBy), and each
referential check into one left-anti join aggregate. Output is the long
format every DQ dashboard wants: (check, metric, violations, passed).

Checks are plain dataclasses, so suites are code-reviewable configuration;
`compile_checks` returns a DataFrame and never collects — callers can
union suites across tables, write them to a history table, or gate a
write on `.filter(~passed).isEmpty()`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


@dataclass(frozen=True)
class Unique:
    """Column (combination) must be unique. violations = rows - distinct."""

    cols: tuple[str, ...]
    name: str = ""


@dataclass(frozen=True)
class Complete:
    """Column must be non-null in at least `ratio` of rows.
    violations = null count; passed compares NON-null share >= ratio using
    exact integer cross-multiplication (no float division)."""

    col: str
    ratio: float = 1.0
    name: str = ""


@dataclass(frozen=True)
class InRange:
    """Non-null values must fall in [lo, hi]. violations = rows outside."""

    col: str
    lo: float
    hi: float
    name: str = ""


@dataclass(frozen=True)
class Satisfies:
    """Arbitrary row predicate (SQL text) that every row must satisfy.
    violations = rows where the predicate is false or null."""

    predicate: str
    name: str = ""


def _label(c) -> str:
    if c.name:
        return c.name
    if isinstance(c, Unique):
        return "unique(" + ",".join(c.cols) + ")"
    if isinstance(c, Complete):
        return f"complete({c.col}>={c.ratio})"
    if isinstance(c, InRange):
        return f"in_range({c.col},[{c.lo},{c.hi}])"
    return f"satisfies({c.predicate})"


def compile_checks(df: DataFrame, checks: list) -> DataFrame:
    """All row-level checks in ONE aggregate pass over ``df``.

    Returns (check_name string, metric bigint, violations bigint, passed
    boolean) — metric is the check's measured quantity (distinct count,
    non-null count, in-range count, satisfying count) so dashboards can
    trend it; violations is rows minus metric except for Complete, where
    the ratio gate decides `passed`.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        if isinstance(c, Unique):
            aggs.append(F.count_distinct(*[F.col(x) for x in c.cols]).alias(f"_m{i}"))
        elif isinstance(c, Complete):
            aggs.append(F.count(F.col(c.col)).alias(f"_m{i}"))
        elif isinstance(c, InRange):
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c.col).isNull()
                        | ((F.col(c.col) >= c.lo) & (F.col(c.col) <= c.hi)),
                        1,
                    ).otherwise(0)
                ).alias(f"_m{i}")
            )
        elif isinstance(c, Satisfies):
            aggs.append(
                F.sum(
                    F.when(F.expr(c.predicate), 1).otherwise(0)
                ).alias(f"_m{i}")
            )
        else:
            raise TypeError(f"unknown check: {c!r}")
    one = df.agg(*aggs)
    rows = []
    for i, c in enumerate(checks):
        m = F.col(f"_m{i}")
        viol = (F.col("_n") - m).cast("bigint")
        if isinstance(c, Complete):
            # exact integer gate: non_null * 10^6 >= ratio * 10^6 * n
            scaled = int(round(c.ratio * 1_000_000))
            passed = m * 1_000_000 >= F.col("_n") * scaled
        else:
            passed = viol == 0
        rows.append(
            F.struct(
                F.lit(_label(c)).alias("check_name"),
                m.cast("bigint").alias("metric"),
                viol.alias("violations"),
                passed.alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str = "",
) -> DataFrame:
    """Orphan check: child rows whose key has no parent — one left-anti
    join collapsed to a 1-row aggregate (same result schema as
    compile_checks; metric = matched rows)."""
    label = name or f"ref({child_key}->{parent_key})"
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    viol = orphans.agg(F.count(F.lit(1)).alias("_v"))
    return total.crossJoin(viol).select(
        F.lit(label).alias("check_name"),
        (F.col("_n") - F.col("_v")).cast("bigint").alias("metric"),
        F.col("_v").cast("bigint").alias("violations"),
        (F.col("_v") == 0).alias("passed"),
    )
