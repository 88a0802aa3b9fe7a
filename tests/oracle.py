"""Local differential harness mirroring the driver's DuckDB-oracle check:
row-count + schema-class + order-insensitive value comparison.

Stricter than it needs to be on floats (exact equality) so that any driver
hashing scheme passes if this does. See corintick_spark.exact for why exact
float equality is attainable.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pandas as pd


def _canon_cell(v):
    """Canonical hashable representation of one cell."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)  # shortest round-trip repr — exact
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "<nan>" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return str(v.value)  # ns since epoch
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _type_class(dtype, sample) -> str:
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "timestamp"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if sample is not None:
        if isinstance(sample, (list, np.ndarray)):
            return "list"
        if isinstance(sample, pd.Timestamp):
            return "timestamp"
        if isinstance(sample, bool):
            return "bool"
        if isinstance(sample, (int, np.integer)):
            return "int"
        if isinstance(sample, (float, np.floating)):
            return "float"
        if isinstance(sample, bytes):
            return "binary"
        import datetime

        if isinstance(sample, datetime.date):
            return "date"
    return "str"


def canon_frame(pdf: pd.DataFrame) -> tuple[dict[str, str], Counter]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    types = {}
    for c in pdf.columns:
        nonnull = pdf[c].dropna()
        sample = nonnull.iloc[0] if len(nonnull) else None
        types[c] = _type_class(pdf[c].dtype, sample)
    rows = Counter()
    cols = [pdf[c] for c in pdf.columns]
    for tup in zip(*cols) if cols else []:
        rows["|".join(_canon_cell(v) for v in tup)] += 1
    return types, rows


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    s_types, s_rows = canon_frame(spark_pdf)
    d_types, d_rows = canon_frame(duck_pdf)
    for c in s_types:
        if s_types[c] != d_types[c]:
            problems.append(f"type[{c}]: spark={s_types[c]} duck={d_types[c]}")
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).items())[:3]
        only_d = list((d_rows - s_rows).items())[:3]
        problems.append(
            f"values differ: {sum((s_rows - d_rows).values())} spark-only rows, "
            f"{sum((d_rows - s_rows).values())} duck-only rows; "
            f"examples spark-only={only_s} duck-only={only_d}"
        )
    return problems


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from corintick_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_duck(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetch_arrow_table().to_pandas()
