"""Skew-join demonstration: naive shuffle join vs AQE skew split vs salting.

Builds a deliberately skewed fact⋈fact join from the sf1 events table —
HALF of all (4x-replicated) rows are remapped onto ONE hot user_id (the
power-law shape a real 100 TB event log has), the right side carries 16
rows per user so the hot key's probe work is amplified — then times three
plans over parquet-staged inputs:

1. naive   — sort-merge join, AQE skew handling OFF: the hot key lands in
             one shuffle partition; one task does half the total work while
             31 cores idle (the 1000-executor version is a 9-hour
             straggler).
2. aqe     — spark.sql.adaptive.skewJoin ON: AQE inspects map output sizes
             at the shuffle boundary and SPLITS the oversized partition
             into advisory-sized sub-partitions, replicating the matching
             right-side partition. Final plan carries `SortMergeJoin(
             skew=true)` (asserted). Thresholds are lowered so local
             MB-scale shuffles trip the same code path 100 TB shuffles trip
             at the defaults.
3. salted  — operators/joins.py::salted_join(salt=32): the explicit rewrite
             for skew AQE cannot see (below) or cannot hold (one key larger
             than an executor).

Findings this script encodes (quoted in SCALING.md §Skew):

- Inputs are staged to parquet first because OptimizeSkewedJoin only
  splits ENSURE_REQUIREMENTS shuffles that sit DIRECTLY under the join's
  sort. When a side's hash partitioning is reused from an upstream
  operation (a distinct/groupBy on the join key, or an explicit
  .repartition, whose shuffle origin is REPARTITION_BY_COL), the rule
  bails — the realistic read-from-storage join is also the one AQE can fix,
  and the reuse-partitioned shape is where salted_join earns its place.
- Skew detection reads COMPRESSED map-output sizes: a hot key's constant
  join column compresses away, so row-skew can hide under byte thresholds
  — another reason explicit salting stays in the toolbox.
- Broadcast is disabled throughout: at this row count Spark would
  otherwise broadcast the dim side and hide the skew entirely (the correct
  plan here, but the one that stops being available when the dim side is
  100 GB).

All three plans produce identical results (asserted on the aggregate).
Prints one JSON line.

Usage: python scripts/bench_skew.py [sf_dir]   (default testdata/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1"
    )
    from pyspark.sql import functions as F

    from corintick_spark.catalog import table
    from corintick_spark.operators.joins import salted_join
    from corintick_spark.session import get_spark

    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = table(spark, sf_dir, "events")
    base = ev.select("event_id", "user_id", "value")
    reps = base
    for i in range(1, 4):
        reps = reps.unionByName(
            base.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    stage = tempfile.mkdtemp(prefix="skewdata_")
    (
        reps.select(
            F.when(F.col("event_id") % 2 == 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_id",
            "value",
        ).write.mode("overwrite").parquet(f"{stage}/left")
    )
    (
        ev.select("user_id").distinct()
        .crossJoin(spark.range(16).select(F.col("id").alias("seq")))
        .withColumn("weight", (F.col("user_id") * 31 + F.col("seq")) % 97)
        .write.mode("overwrite").parquet(f"{stage}/right")
    )
    left = spark.read.parquet(f"{stage}/left")
    right = spark.read.parquet(f"{stage}/right")
    n_left, n_right = left.count(), right.count()

    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")

    def mk(mode):
        if mode == "salted":
            j = salted_join(left, right, on="user_id", salt=32, salt_source="event_id")
        else:
            j = left.join(right, "user_id")
        return j.groupBy("seq").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value") * F.col("weight")).alias("wv"),
        )

    out: dict[str, object] = {"n_left": n_left, "n_right": n_right}
    results: dict[str, dict] = {}
    try:
        for mode in ("naive", "aqe", "salted"):
            conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(mode == "aqe").lower()
            )
            times, rows = [], None
            for _ in range(3):
                agg = mk(mode)
                t0 = time.perf_counter()
                rows = agg.collect()
                times.append(time.perf_counter() - t0)
            results[mode] = {r["seq"]: (r["n"], r["wv"]) for r in rows}
            out[mode + "_sec"] = round(sorted(times)[1], 3)
            if mode == "aqe":
                plan = agg._jdf.queryExecution().executedPlan().toString()
                out["aqe_skew_split"] = "skew=true" in plan
        # identical counts; float sums agree to relative 1e-9 (summation
        # order differs across plans, so bit-equality is not expected)
        ref = results["naive"]
        for mode in ("aqe", "salted"):
            assert set(results[mode]) == set(ref), "plans disagree on groups"
            for k, (n, wv) in results[mode].items():
                assert n == ref[k][0], f"{mode} count mismatch at seq={k}"
                assert abs(wv - ref[k][1]) <= 1e-9 * max(1.0, abs(ref[k][1])), (
                    f"{mode} sum mismatch at seq={k}"
                )
        assert out["aqe_skew_split"], "AQE skew split did not engage"
        print(json.dumps(out))
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            conf.unset(k)
        shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
