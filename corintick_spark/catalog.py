"""Table loading over the driver-provided parquet datasets.

The reference's data model (SURVEY.md §1.1: `api.py::Corintick.read` † —
uid-keyed chunked BSON documents in MongoDB) maps to one parquet dataset per
logical table. The `events` table is the corintick-shaped time series
(`user_id` ≈ uid, `ts` ≈ DatetimeIndex): it is stored as TIMESTAMP(NANOS),
which Spark cannot read natively, so we read it with
`spark.sql.legacy.parquet.nanosAsLong` and derive:

- ``ts``    — TimestampType, µs precision (truncated; identical to DuckDB's
              ns→µs read of the same file, so oracle comparisons are exact)
- ``ts_ns`` — the raw int64 nanoseconds, kept for precision-sensitive ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from corintick_spark.session import RUNTIME_CONFS

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs; safe on a session we didn't build (driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on a started session — keep going
            pass
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(ts_ns div 1000)")
        )
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
