"""Table loading over the driver-provided parquet datasets.

The reference's data model (SURVEY.md §1.1: `api.py::Corintick.read` † —
uid-keyed chunked BSON documents in MongoDB) maps to one parquet dataset per
logical table. The `events` table is the corintick-shaped time series
(`user_id` ≈ uid, `ts` ≈ DatetimeIndex). The driver's testdata has shipped
`ts` in two physical vintages — TIMESTAMP(NANOS) (which Spark can only read
via `spark.sql.legacy.parquet.nanosAsLong`, yielding int64) and plain
timestamp[us] — so `normalize_event_time` adapts on schema and always
yields the same logical pair:

- ``ts``    — TimestampType, µs precision (identical to DuckDB's read of
              the same file, so oracle comparisons are exact)
- ``ts_ns`` — int64 epoch nanoseconds, kept for precision-sensitive ops
              (exact for the ns vintage; µs-resolution otherwise).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

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


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make `corintick_spark` importable on executor Python workers.

    Pandas UDFs / applyInPandas functions are pickled with references into
    this package; workers spawn with their own sys.path (they do NOT inherit
    the driver process's), so the package must travel via addPyFile — the
    same mechanism that ships the library to a 1000-executor cluster.
    Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stamp = max(
        int(os.path.getmtime(os.path.join(r, f)))
        for r, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    zpath = os.path.join(tempfile.gettempdir(), f"corintick_spark_{stamp}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    _SHIPPED.add(sc.applicationId)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs; safe on a session we didn't build (driver's)."""
    from corintick_spark.session import default_parallelism

    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on a started session — keep going
            pass
    try:
        # a foreign session defaults to 200 shuffle partitions — far too many
        # tasks for local mode (AQE coalesces sizes, not scheduling overhead)
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(default_parallelism())
            )
    except Exception:
        pass
    _ship_package(spark)
    return spark


def normalize_event_time(df: DataFrame) -> DataFrame:
    """Schema-adaptive events time normalization (see module docstring).

    Output column order is identical for both vintages: the original order
    with ``ts`` replaced by ``ts_ns`` in place and the derived µs ``ts``
    appended last — streaming replays depend on batch/stream schema parity.
    """
    original = df.columns
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":  # TIMESTAMP(NANOS) vintage read via nanosAsLong
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(ts_ns div 1000)")
        )
    # timestamp[us] vintage (read as TIMESTAMP_NTZ by Spark's parquet
    # inference); session timeZone=UTC makes the NTZ→TZ cast instant-exact
    df = df.withColumn(
        "ts_ns",
        F.expr("unix_micros(cast(ts as timestamp)) * cast(1000 as bigint)"),
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return df.select(
        *[c if c != "ts" else "ts_ns" for c in original], "ts"
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df)
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose the testdata tables as temp views so users can drive the
    engine through plain ``spark.sql`` — the SQL half of the API surface.
    Views go through :func:`table`, so the events time normalization and
    runtime confs apply identically to SQL and DataFrame callers."""
    for name in names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
