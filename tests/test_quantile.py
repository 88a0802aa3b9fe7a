"""Exact distributed selection (operators/quantile.py): k-th smallest by
iterative bucket histograms vs an in-memory sort."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from corintick_spark.operators.quantile import exact_quantile, kth_smallest


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def test_matches_sorted_reference(spark):
    vals = [((i * 2654435761) % 100003) - 50000 for i in range(5000)]
    vals += vals[:500]  # duplicates
    df = _df(spark, vals)
    ref = sorted(vals)
    for k in (1, 2, 1000, len(vals) // 2, len(vals) - 1, len(vals)):
        assert kth_smallest(df, "x", k) == ref[k - 1]


def test_wide_domain_multiple_passes(spark):
    # domain ~2^40 forces >1 histogram pass (bucket size > 1 first round)
    vals = [(i * 123456789123) % (1 << 40) for i in range(2000)]
    df = _df(spark, vals)
    ref = sorted(vals)
    for k in (1, 777, 2000):
        assert kth_smallest(df, "x", k) == ref[k - 1]


def test_nulls_excluded_and_errors(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "x bigint")
    assert kth_smallest(df, "x", 2) == 3
    with pytest.raises(ValueError):
        kth_smallest(df, "x", 3)  # only 2 non-null rows
    with pytest.raises(ValueError):
        kth_smallest(df, "x", 0)
    with pytest.raises(ValueError):
        exact_quantile(df.filter("x IS NULL"), "x", 0.5)
    with pytest.raises(ValueError):
        exact_quantile(df, "x", 0.0)


def test_quantile_disc_semantics(spark):
    vals = list(range(1, 11))  # 1..10
    df = _df(spark, vals)
    assert exact_quantile(df, "x", 0.5) == 5   # ceil(0.5*10) = 5
    assert exact_quantile(df, "x", 0.25) == 3  # ceil(2.5) = 3
    assert exact_quantile(df, "x", 1.0) == 10
    assert exact_quantile(df, "x", 0.1) == 1
