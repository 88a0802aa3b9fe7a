"""DQ check suite (operators/dq.py): every check type's violation path on
planted bad data, and the one-pass compilation claim."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.operators.dq import (
    Complete,
    InRange,
    Satisfies,
    Unique,
    compile_checks,
    referential_check,
)


def test_all_checks_violation_paths(spark):
    rows = [
        (1, 5.0, "a"),
        (1, None, "a"),      # dup id + null value
        (2, 500.0, "b"),     # out of range
        (3, 7.0, "zzz"),     # bad domain
    ]
    df = spark.createDataFrame(rows, "id long, v double, cat string")
    out = {
        r.check_name: (r.metric, r.violations, r.passed)
        for r in compile_checks(
            df,
            [
                Unique(("id",), name="u"),
                Complete("v", ratio=0.9, name="c"),
                InRange("v", -100, 100, name="r"),
                Satisfies("cat IN ('a','b')", name="s"),
            ],
        ).collect()
    }
    assert out["u"] == (3, 1, False)
    assert out["c"] == (3, 1, False)      # 3/4 < 0.9
    assert out["r"] == (3, 1, False)      # 500 outside; NULL not a range violation
    assert out["s"] == (3, 1, False)


def test_complete_ratio_gate_exact_boundary(spark):
    df = spark.createDataFrame(
        [(i, 1.0 if i else None) for i in range(10)], "id long, v double"
    )
    got = {
        r.check_name: r.passed
        for r in compile_checks(
            df, [Complete("v", 0.9, name="at"), Complete("v", 0.91, name="above")]
        ).collect()
    }
    assert got["at"] is True      # exactly 9/10 passes ratio 0.9
    assert got["above"] is False


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    r = referential_check(child, parent, "k", "k").collect()[0]
    assert (r.metric, r.violations, r.passed) == (2, 1, False)


def test_single_aggregate_pass(spark):
    """All row-level checks must compile into ONE aggregate over the
    input — exactly one (partial, final) HashAggregate pair, no repeated
    scans."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("v")
    )
    plan = (
        compile_checks(df, [Unique(("id",)), Complete("v"), InRange("v", 0, 5)])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= 1
