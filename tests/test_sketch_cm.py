"""Count-Min sketch: one-sided error, exact mergeability, determinism.

Pinned properties (operators/sketch_cm.py):
1. estimates NEVER undercount the true frequency;
2. overcount stays within the CM bound (checked against a generous
   empirical budget: 2*e*N/width across every key — far above the
   per-query expectation, so not flaky);
3. merge is EXACT: sketch(A ++ B) equals cm_merge(sketch(A), sketch(B))
   cell for cell, and estimates from either are identical;
4. NULL keys are skipped; two builds are bit-identical (fixed seeds)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.operators.sketch_cm import cm_build, cm_estimate, cm_merge

DEPTH, WIDTH = 4, 8192


def test_one_sided_error_and_bound(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    sketch = cm_build(ev, "user_id", DEPTH, WIDTH)
    true = {r.user_id: r["count"] for r in ev.filter(F.col("user_id").isNotNull())
            .groupBy("user_id").count().collect()}
    items = ev.select("user_id").distinct()
    est = {r.user_id: r.est_count
           for r in cm_estimate(sketch, items, "user_id", DEPTH, WIDTH).collect()}
    n = sum(true.values())
    budget = 2 * math.e * n / WIDTH
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, f"undercount for {k}"
        assert est[k] - t <= budget, f"overcount beyond budget for {k}"


def test_exact_merge(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cm_merge(
        cm_build(a, "user_id", DEPTH, WIDTH), cm_build(b, "user_id", DEPTH, WIDTH)
    )
    whole = cm_build(ev, "user_id", DEPTH, WIDTH)
    mrows = {(r.j, r.bucket): r.cnt for r in merged.collect()}
    wrows = {(r.j, r.bucket): r.cnt for r in whole.collect()}
    assert mrows == wrows


def test_null_skip_and_determinism(spark):
    d = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "k long"
    )
    s1 = sorted((r.j, r.bucket, r.cnt) for r in cm_build(d, "k", DEPTH, WIDTH).collect())
    s2 = sorted((r.j, r.bucket, r.cnt) for r in cm_build(d, "k", DEPTH, WIDTH).collect())
    assert s1 == s2
    total = sum(c for _, _, c in s1)
    assert total == 3 * DEPTH  # NULL contributed nothing
    est = {r.k: r.est_count
           for r in cm_estimate(cm_build(d, "k", DEPTH, WIDTH),
                                d.select("k").distinct(), "k", DEPTH, WIDTH).collect()}
    assert est[1] >= 2 and est[2] >= 1
