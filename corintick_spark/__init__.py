"""corintick_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gusutabopb/corintick, re-expressed Spark-first.

The reference (gusutabopb/corintick — a MongoDB-backed columnar tick store;
see SURVEY.md §0 for provenance conventions) is a storage/retrieval layer for
pandas DataFrames: write(uid, df), read(uid, start, end, columns), list_uids.
This package keeps that Tier-A surface (`corintick_spark.storage.TickStore`)
and adds the full analytics surface (joins incl. as-of, window/rolling ops,
resampling, dedup, similarity search, text analysis, streaming) as idiomatic
Spark DataFrame operators — declarative plans that Catalyst/Tungsten optimize,
designed for partitioned Parquet at 100 TB scale.
"""

from corintick_spark.session import get_spark
from corintick_spark.catalog import table, tables, TABLE_NAMES
from corintick_spark.storage import TickStore
from corintick_spark.compat import Corintick

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "table",
    "tables",
    "TABLE_NAMES",
    "TickStore",
    "Corintick",
    "__version__",
]
