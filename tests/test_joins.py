"""Bucketed co-located join + salted skew join: semantic equivalence to the
plain join and the plan properties that make them worth having."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.operators.joins import read_table, salted_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), "l_orderkey", 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b",
        str(tmp_path / "o_b"),
        "l_orderkey",
        8,
    )
    # disable broadcast so the sort-merge path is planned — the point is
    # that bucket layout removes the hash-partitioning exchanges entirely
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "li_b").join(read_table(spark, "o_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles:\n" + plan
        )
        assert "SortMergeJoin" in plan
        expected = li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    meta = spark.range(200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier"), (F.col("id") % 3).cast("string")).alias("tier"),
    )
    plain = (
        ev.join(meta, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    )
    salted = (
        salted_join(ev, meta, on="user_id", salt=8, salt_source="event_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in multiple salt lanes."""
    hot = spark.range(10000).select(
        F.lit(42).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = salted_join(hot, dim, on="k", salt=8, salt_source="row_id")
    assert out.count() == 10000
    lanes = (
        hot.withColumn("_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert lanes == 8
