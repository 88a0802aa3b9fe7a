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
