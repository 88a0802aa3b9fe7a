"""Conditional input spreading for CPU-bound per-row operators.

The dedup/similarity operators do heavy per-row JVM work (shingling,
signature hashing, SRP projections). On a laptop-style run a single parquet
file arrives as ONE partition and serializes that work on one core, so
round-1 inserted an unconditional ``repartition(defaultParallelism)``.
That was wrong at scale: a round-robin repartition is a FULL shuffle of the
input — text and embedding payloads included — even when the scan already
arrived as thousands of well-sized partitions, which is exactly the 100 TB
case. ``spread_input`` keeps the local win and removes the cluster cost by
repartitioning only when the input is narrower than the session's
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` — but only
    when it actually has fewer partitions than that (the single-file local
    scan this exists for). Otherwise the input is returned untouched, so a
    well-partitioned cluster scan never pays a payload shuffle here.

    The probe (``df.rdd.getNumPartitions()``) plans the query physically but
    launches no job. Disable the whole mechanism (e.g. when even the probe
    is unwanted, or to pin plans in tests) with
    ``spark.conf.set("corintick.spread.enabled", "false")``.
    """
    spark = df.sparkSession
    if str(spark.conf.get("corintick.spread.enabled", "true")).lower() != "true":
        return df
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
