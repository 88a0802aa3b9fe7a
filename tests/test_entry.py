"""Smoke test of the driver contract module."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "n_name", "n_items", "revenue"} <= set(df.columns)


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20


def test_driver_window_occupies_first_slots():
    """The external driver adjudicates the FIRST 50 registered queries;
    load_all must keep DRIVER_WINDOW in those slots no matter how many
    queries later modules register."""
    from corintick_spark.registry import DRIVER_WINDOW, load_all

    names = list(load_all())
    assert tuple(names[: len(DRIVER_WINDOW)]) == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
