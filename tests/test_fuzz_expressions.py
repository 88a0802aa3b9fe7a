"""Seeded grammar fuzz differential: random dialect-neutral scalar SQL
expressions evaluated VERBATIM by Spark SQL and DuckDB over the same
lineitem parquet must agree exactly.

Why: the oracle suite pins hand-written queries; this pins the scalar
EXPRESSION SEMANTICS themselves (arithmetic, three-valued logic, CASE,
NULL propagation, string ops) across a combinatorial space no hand-written
list covers. The generator is deterministic (fixed seeds), so the suite is
reproducible — any failure is a genuine cross-engine divergence to triage,
never flake.

Deliberately excluded constructs (known dialect divergences, documented so
nobody "fixes" a failure by silently widening this list):
- floating arithmetic and `/` (both engines produce doubles; float repr
  equality is the exact.py scaled-long problem, solved elsewhere)
- integer overflow (ANSI Spark aborts, DuckDB promotes to HUGEINT) —
  operands are range-bounded instead
- substr with non-positive start (1-based clamping differs)
- implicit casts in comparisons (string vs int ordering differs)
"""

from __future__ import annotations

import random

import pytest

from tests.oracle import compare, run_duck

# depth-bounded grammar over the lineitem columns with portable semantics
INT_COLS = ["l_orderkey % 997", "l_partkey % 101", "l_suppkey % 53",
            "CAST(l_linenumber AS BIGINT)"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def gen_int(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.25:
        if rng.random() < 0.6:
            return rng.choice(INT_COLS)
        return str(rng.randint(-20, 20))
    op = rng.choice(
        ["add", "sub", "mul", "mod", "case", "coalesce", "abs",
         "greatest", "least", "length", "nullif"]
    )
    a, b = gen_int(rng, depth - 1), gen_int(rng, depth - 1)
    if op == "add":
        return f"({a} + {b})"
    if op == "sub":
        return f"({a} - {b})"
    if op == "mul":
        # keep products far from 2^63: one side collapses to a small int
        return f"(({a}) % 31 * ({b}) % 17)"
    if op == "mod":
        return f"(({a}) % NULLIF(({b}) % 13, 0))"
    if op == "case":
        return f"(CASE WHEN {gen_bool(rng, depth - 1)} THEN {a} ELSE {b} END)"
    if op == "coalesce":
        return f"COALESCE({a}, {b})"
    if op == "abs":
        return f"ABS({a})"
    if op == "greatest":
        return f"GREATEST({a}, {b})"
    if op == "least":
        return f"LEAST({a}, {b})"
    if op == "length":
        return f"CAST(LENGTH({gen_str(rng, depth - 1)}) AS BIGINT)"
    return f"NULLIF({a}, {b})"


def gen_str(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.7:
            return rng.choice(STR_COLS)
        return "'" + rng.choice(["x", "AB", "q-9", "", "Zz"]) + "'"
    op = rng.choice(["upper", "lower", "concat", "substr", "trim",
                     "replace", "case"])
    a = gen_str(rng, depth - 1)
    if op == "upper":
        return f"UPPER({a})"
    if op == "lower":
        return f"LOWER({a})"
    if op == "concat":
        return f"({a} || {gen_str(rng, depth - 1)})"
    if op == "substr":
        return f"SUBSTR({a}, {rng.randint(1, 3)}, {rng.randint(0, 4)})"
    if op == "trim":
        return f"TRIM({a})"
    if op == "replace":
        return f"REPLACE({a}, 'A', '{rng.choice(['', '_', 'aa'])}')"
    return (
        f"(CASE WHEN {gen_bool(rng, depth - 1)} THEN {a}"
        f" ELSE {gen_str(rng, depth - 1)} END)"
    )


def gen_bool(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["TRUE", "FALSE"])
    op = rng.choice(["cmp", "scmp", "and", "or", "not", "isnull", "in",
                     "between"])
    if op == "cmp":
        c = rng.choice(["=", "<", ">", "<=", ">=", "<>"])
        return f"({gen_int(rng, depth - 1)} {c} {gen_int(rng, depth - 1)})"
    if op == "scmp":
        c = rng.choice(["=", "<", ">"])
        return f"({gen_str(rng, depth - 1)} {c} {gen_str(rng, depth - 1)})"
    if op == "and":
        return f"({gen_bool(rng, depth - 1)} AND {gen_bool(rng, depth - 1)})"
    if op == "or":
        return f"({gen_bool(rng, depth - 1)} OR {gen_bool(rng, depth - 1)})"
    if op == "not":
        return f"(NOT {gen_bool(rng, depth - 1)})"
    if op == "isnull":
        return f"({gen_int(rng, depth - 1)} IS NULL)"
    if op == "in":
        vals = ", ".join(str(rng.randint(-5, 9)) for _ in range(3))
        return f"({gen_int(rng, depth - 1)} IN ({vals}))"
    return (
        f"({gen_int(rng, depth - 1)} BETWEEN {rng.randint(-9, 0)}"
        f" AND {rng.randint(1, 99)})"
    )


def build_query(seed: int, n_exprs: int = 8) -> str:
    rng = random.Random(seed)
    cols = []
    for i in range(n_exprs):
        kind = rng.choice(["int", "str", "bool"])
        if kind == "int":
            e = f"CAST({gen_int(rng, 3)} AS BIGINT)"
        elif kind == "str":
            e = gen_str(rng, 3)
        else:
            e = gen_bool(rng, 3)
        cols.append(f"{e} AS c{i}")
    return (
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
        + ", ".join(cols)
        + " FROM lineitem"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_expression_parity(seed, spark, duck, sf_dir):
    from corintick_spark.catalog import register_views

    register_views(spark, sf_dir)
    sql = build_query(seed)
    got = spark.sql(sql).toPandas()
    want = run_duck(duck, sql)
    probs = compare(f"fuzz{seed}", got, want)
    assert not probs, f"seed {seed}: {probs}\nSQL: {sql}"


def build_agg_query(seed: int, n_exprs: int = 5) -> str:
    """Aggregate tier: GROUP BY a low-cardinality key with SUM/COUNT/MIN/
    MAX over generated integer expressions — pins partial/final agg
    semantics and NULL-skipping across engines. SUM is cast to BIGINT in
    the shared text (DuckDB widens BIGINT sums to HUGEINT; Spark keeps
    BIGINT — the cast makes the contract explicit in both)."""
    rng = random.Random(10_000 + seed)
    key = rng.choice(["l_returnflag", "l_linestatus",
                      "CAST(l_orderkey % 7 AS BIGINT)"])
    cols = []
    for i in range(n_exprs):
        e = gen_int(rng, 2)
        agg = rng.choice(["sum", "count", "min", "max", "countif"])
        if agg == "sum":
            cols.append(f"CAST(SUM({e}) AS BIGINT) AS c{i}")
        elif agg == "count":
            cols.append(f"COUNT({e}) AS c{i}")
        elif agg == "min":
            cols.append(f"CAST(MIN({e}) AS BIGINT) AS c{i}")
        elif agg == "max":
            cols.append(f"CAST(MAX({e}) AS BIGINT) AS c{i}")
        else:
            cols.append(
                f"COUNT(CASE WHEN {gen_bool(rng, 2)} THEN 1 END) AS c{i}"
            )
    return (
        f"SELECT {key} AS gk, COUNT(*) AS n, " + ", ".join(cols)
        + " FROM lineitem GROUP BY " + key
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_aggregate_parity(seed, spark, duck, sf_dir):
    from corintick_spark.catalog import register_views

    register_views(spark, sf_dir)
    sql = build_agg_query(seed)
    got = spark.sql(sql).toPandas()
    want = run_duck(duck, sql)
    probs = compare(f"fuzzagg{seed}", got, want)
    assert not probs, f"seed {seed}: {probs}\nSQL: {sql}"
