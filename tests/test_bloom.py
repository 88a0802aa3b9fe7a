"""Bloom-filter semi-join reduction (operators/bloom.py).

The contract under test: the rewrite is result-invisible (exactly the
plain semi-join, even when the filter is sized to force false positives),
has NO false negatives ever, merges distributively, and actually filters
(the probe predicate sits below the verifying join in the plan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from corintick_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom,
    merge_blooms,
    might_contain,
)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(0, 300).select((F.col("id") * 13 + 7).alias("k"))


def test_no_false_negatives(spark, dim):
    words = build_bloom(dim, "k", num_bits=1 << 10, num_hashes=4)
    missed = dim.filter(~might_contain(F.col("k"), words, 4)).count()
    assert missed == 0


def test_exact_under_forced_false_positives(spark, dim):
    # 256 bits for 300 keys → filter is near-saturated, FP rate is huge;
    # the verifying semi-join must still make the result exact
    fact = spark.range(0, 8000).select(
        (F.col("id") % 5000).alias("fk"), F.col("id").alias("v")
    )
    got = bloom_semi_join(fact, dim, "fk", "k", num_bits=256, num_hashes=3)
    want = fact.join(
        dim.select(F.col("k").alias("fk")).distinct(), "fk", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_prefilter_actually_prunes(spark, dim):
    # properly sized filter: the prefilter output should be close to the
    # true match count, nowhere near |fact|
    fact = spark.range(0, 20000).select((F.col("id") % 10000).alias("fk"))
    words = build_bloom(dim, "k", num_bits=1 << 14, num_hashes=5)
    pre = fact.filter(might_contain(F.col("fk"), words, 5)).count()
    true = fact.join(
        dim.select(F.col("k").alias("fk")).distinct(), "fk", "left_semi"
    ).count()
    assert true <= pre < true + 0.05 * 20000  # <5% FP leakage


def test_merge_equals_union_build(spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 250).select(F.col("id").alias("k"))
    merged = merge_blooms(
        build_bloom(a, "k", 1 << 10, 4), build_bloom(b, "k", 1 << 10, 4)
    )
    full = build_bloom(a.unionByName(b), "k", 1 << 10, 4)
    assert merged == full


def test_null_keys_neither_set_nor_match(spark):
    dim = spark.createDataFrame(
        [(1,), (None,), (3,)], "k bigint"
    )
    words = build_bloom(dim, "k", 1 << 10, 4)
    fact = spark.createDataFrame([(1,), (None,), (2,)], "fk bigint")
    got = bloom_semi_join(fact, dim, "fk", "k", num_bits=1 << 10, num_hashes=4)
    assert [r.fk for r in got.collect()] == [1]


def test_string_keys(spark):
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    fact = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "fk string"
    )
    got = bloom_semi_join(fact, dim, "fk", "k", num_bits=1 << 10, num_hashes=4)
    assert sorted(r.fk for r in got.collect()) == ["a", "b"]


def test_plan_shape_prefilter_below_join(spark, dim):
    """The xxhash64 membership predicate must be a Filter on the fact scan
    side BELOW the verifying join — i.e. it prunes before any shuffle."""
    fact = spark.range(0, 1000).select(F.col("id").alias("fk"))
    plan = bloom_semi_join(
        fact, dim, "fk", "k", num_bits=1 << 10, num_hashes=4
    )._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.index("Join LeftSemi")
    filt_at = plan.index("xxhash64")
    assert filt_at > join_at  # deeper in the tree = printed after the join


def test_rejects_unaligned_num_bits(spark, dim):
    with pytest.raises(ValueError):
        build_bloom(dim, "k", num_bits=100)
    with pytest.raises(ValueError):
        merge_blooms([0] * 4, [0] * 8)


def test_bitmap_exact_no_join_in_plan(spark, dim):
    fact = spark.range(0, 6000).select((F.col("id") % 5000).alias("fk"))
    from corintick_spark.operators.bloom import bitmap_semi_join

    got = bitmap_semi_join(fact, dim, "fk", "k", max_key=4096)
    want = fact.join(
        dim.select(F.col("k").alias("fk")).distinct(), "fk", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # the semi-join is GONE, not just reduced


def test_bitmap_rejects_out_of_domain_and_huge_domain(spark, dim):
    from corintick_spark.operators.bloom import build_bitmap

    with pytest.raises(ValueError, match="outside"):
        build_bitmap(dim, "k", max_key=100)  # dim has keys up to ~3900
    with pytest.raises(ValueError, match="too large"):
        build_bitmap(dim, "k", max_key=1 << 30)
    with pytest.raises(ValueError):
        build_bitmap(dim, "k", max_key=-1)


def test_bitmap_null_and_boundary_keys(spark):
    from corintick_spark.operators.bloom import bitmap_semi_join

    dim = spark.createDataFrame([(0,), (63,), (64,), (None,)], "k bigint")
    fact = spark.createDataFrame(
        [(0,), (63,), (64,), (65,), (None,), (-1,)], "fk bigint"
    )
    got = bitmap_semi_join(fact, dim, "fk", "k", max_key=64)
    assert sorted(r.fk for r in got.collect()) == [0, 63, 64]


def _auto(spark, fact, dim, **kw):
    from corintick_spark.operators.bloom import semi_join_auto

    got = semi_join_auto(fact, dim, "fk", "k", **kw)
    want = fact.join(
        dim.select(F.col("k").alias("fk")).distinct(), "fk", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    return got._jdf.queryExecution().executedPlan().toString()


def test_auto_routes_to_bitmap_for_bounded_ints(spark, dim):
    fact = spark.range(0, 3000).select((F.col("id") % 4000).alias("fk"))
    plan = _auto(spark, fact, dim)
    assert "Join" not in plan  # bitmap branch: join eliminated


def test_auto_routes_to_broadcast_for_small_string_dims(spark):
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    fact = spark.createDataFrame([("a",), ("c",)], "fk string")
    plan = _auto(spark, fact, dim)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "xxhash64" not in plan


def test_auto_routes_to_bloom_when_big(spark):
    # force the bloom branch: strings (no bitmap) + tiny broadcast cap
    dim = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    fact = spark.range(0, 2000).select(
        (F.col("id") % 1500).cast("string").alias("fk")
    )
    plan = _auto(spark, fact, dim, broadcast_rows_max=10)
    assert "xxhash64" in plan and "LeftSemi" in plan


def test_auto_empty_dim(spark):
    from corintick_spark.operators.bloom import semi_join_auto

    dim = spark.createDataFrame([], "k bigint")
    fact = spark.range(0, 10).select(F.col("id").alias("fk"))
    assert semi_join_auto(fact, dim, "fk", "k").count() == 0


def test_bitmap_anti_exact_and_joinless(spark, dim):
    from corintick_spark.operators.bloom import bitmap_anti_join

    fact = spark.createDataFrame(
        [(7,), (3,), (None,), (99999,)], "fk bigint"
    ).unionByName(spark.range(0, 3000).select((F.col("id") % 5000).alias("fk")))
    got = bitmap_anti_join(fact, dim, "fk", "k", max_key=4096)
    want = fact.join(
        dim.select(F.col("k").alias("fk")).distinct(), "fk", "left_anti"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # NULL and out-of-domain keys retained (LEFT ANTI semantics)
    kept = {r.fk for r in got.collect()}
    assert None in kept and 99999 in kept
