"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``corintick_spark.registry`` (one (PySpark, DuckDB-SQL)
pair per implemented operator from SURVEY.md §2); this module just adapts
that registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by region/nation —
    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with broadcast dims,
    filter + aggregate + sort (SURVEY.md §7 M0)."""
    import pyspark.sql.functions as F

    from corintick_spark.catalog import table
    from corintick_spark.exact import dsum

    sf_dir = "/root/testdata/sf0.001"
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.expr("l_extendedprice * (1 - l_discount)"), "revenue"),
        )
        .orderBy(F.desc("revenue"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from corintick_spark.registry import load_all

    return {name: q.spark for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; omitted keys
    get the driver's weaker rows-only check (streaming, approx sketches,
    MinHash banding — see SURVEY.md §5)."""
    from corintick_spark.registry import load_all

    return {name: q.sql for name, q in load_all().items() if q.sql is not None}
