"""Central registry of (PySpark query, DuckDB oracle SQL) pairs.

Every operator from SURVEY.md §2 that is "done" has an entry here: a
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an
equivalent ANSI SQL string the driver runs through DuckDB on the same
parquet views. Column names and value determinism are part of the
contract — see corintick_spark.exact for the float-determinism helpers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, sql: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, sql, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: registration) and return them."""
    from corintick_spark.queries import (  # noqa: F401
        tier_a,
        relational,
        windows,
        scalars,
        udfs,
        llm,
        storage_queries,
        streaming_queries,
    )

    return QUERIES
