"""HLL sketch aggregate: estimate must track the exact distinct count."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.registry import load_all


def test_hll_estimate_within_error(spark, sf_dir):
    reg = load_all()
    est = {
        r.event_type: r.approx_users
        for r in reg["agg_hll_sketch"].spark(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        # HLL with default lgConfigK=12 → ~1.6% stderr; allow 5%
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_hll_sketches_merge(spark, sf_dir):
    """Sketches built per half must union to (approximately) the global
    distinct count — the property that makes them usable incrementally."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    halves = ev.withColumn("half", (F.col("event_id") % 2).cast("int"))
    merged = (
        halves.groupBy("half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]
        .est
    )
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(2, 0.05 * exact)


def test_approx_quantile_tracks_exact(spark, sf_dir):
    reg = load_all()
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in reg["agg_approx_quantile"].spark(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # GK's guarantee is on RANK, not value: the returned order statistic
    # must fall inside the exact [q-eps, q+eps] percentile band (value
    # bounds would fail where adjacent order stats are far apart, e.g. p99
    # of a small group).
    bands = {
        r.event_type: r.qs
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.48, 0.52, 0.88, 0.92, 0.97, 1.0))"
            ).alias("qs")
        )
        .collect()
    }
    for k, (lo1, hi1, lo2, hi2, lo3, hi3) in bands.items():
        p50, p90, p99 = approx[k]
        assert lo1 - 1e-9 <= p50 <= hi1 + 1e-9, (k, p50, lo1, hi1)
        assert lo2 - 1e-9 <= p90 <= hi2 + 1e-9, (k, p90, lo2, hi2)
        assert lo3 - 1e-9 <= p99 <= hi3 + 1e-9, (k, p99, lo3, hi3)


def test_misra_gries_exact_heavy_hitters(spark):
    """2-pass MG must return EXACTLY the items with freq > n/k (superset
    candidates + exact verification), on an adversarial distribution:
    a few hot items drowned in a long unique tail."""
    import pyspark.sql.functions as F

    from corintick_spark.operators.heavyhitters import heavy_hitters

    # 3 hot items (1200/800/600) + 8000 singletons + nulls; n=10600, k=100
    # -> threshold 106: exactly {hot0, hot1, hot2} qualify
    rows = (
        [("hot0",)] * 1200
        + [("hot1",)] * 800
        + [("hot2",)] * 600
        + [(f"u{i}",) for i in range(8000)]
        + [(None,)] * 50
    )
    df = spark.createDataFrame(rows, "item string").repartition(16)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", k=100).collect()
    }
    assert got == {("hot0", 1200), ("hot1", 800), ("hot2", 600)}

    # differential vs plain groupBy on a borderline threshold (k=5000 ->
    # threshold ~2.1: everything with cnt >= 3)
    exact = {
        (r["item"], r["cnt"])
        for r in df.filter("item is not null")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 10600 / 5000)
        .collect()
    }
    got2 = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", k=5000).collect()
    }
    assert got2 == exact

    # empty input
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", k=10).count() == 0
