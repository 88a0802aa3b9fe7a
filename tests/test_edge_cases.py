"""Adversarial edge-dataset differential: EVERY oracle-paired query runs on
testdata/edge (scripts/make_edge.py — empty/whitespace documents,
single-tick and sub-grid-span users, tied timestamps, zero-variance
series, zero/identical embedding vectors, orders with no lineitems and an
orphan lineitem) and must still match DuckDB exactly.

This sweep exists because a 60k-row uniform sample never contains these
boundaries but a 100 TB corpus always does. It has already caught four
production bugs: the descending sequence() grid for sub-step spans, ANSI
DIVIDE_BY_ZERO on zero-norm cosine, 0/0 Jaccard on token-less docs, and
''-vs-NULL empty-chunk text."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from corintick_spark.registry import load_all
from tests.oracle import compare, duck_connection, run_duck
from tests.test_oracle_queries import edge_core_first

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGE_DIR = os.path.join(REPO, "testdata", "edge")

QUERIES = load_all()
ORACLE = sorted(n for n, q in QUERIES.items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.sql is None)


@pytest.fixture(scope="session")
def edge_dir() -> str:
    if not os.path.exists(os.path.join(EDGE_DIR, "events.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_edge.py")],
            check=True,
        )
    return EDGE_DIR


@pytest.fixture(scope="session")
def edge_duck(edge_dir):
    con = duck_connection(edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", edge_core_first(ORACLE))
def test_edge_oracle_match(name, spark, edge_duck, edge_dir):
    q = QUERIES[name]
    got = q.spark(spark, edge_dir).toPandas()
    want = run_duck(edge_duck, q.sql)
    problems = compare(name, got, want)
    assert not problems, f"{name} (edge): " + "; ".join(problems)


@pytest.mark.parametrize("name", edge_core_first(ROWS_ONLY))
def test_edge_rows_only_runs(name, spark, edge_dir):
    n1 = QUERIES[name].spark(spark, edge_dir).count()
    n2 = QUERIES[name].spark(spark, edge_dir).count()
    assert n1 == n2
