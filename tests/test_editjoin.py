"""edit_pairs_qgram ≡ naive all-pairs edit-distance join.

The positional q-gram count filter is a lossless candidate pruning; its
output must equal the naive cross-join + levenshtein on every input,
including the shapes that break sloppy implementations: repetitive text
(distinct-position undercounting), short strings (non-positive bound),
empty strings, sentinel-colliding characters, and exact duplicates."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

import pytest

from corintick_spark.catalog import table
from corintick_spark.operators.dedup import edit_pairs_passjoin, edit_pairs_qgram

# Both candidate schemes share the output contract and the naive oracle:
# positional q-gram probing prefixes (Ed-Join) and PassJoin segment
# indexing. Every differential below runs against BOTH.
IMPLS = [edit_pairs_qgram, edit_pairs_passjoin]
IMPL_IDS = ["qgram", "passjoin"]


def _naive(spark, df, k, prefix_len=40):
    base = df.select(
        F.col("doc_id").alias("_id"),
        F.substring("text", 1, prefix_len).alias("_s"),
    )
    a = base.select(F.col("_id").alias("a_id"), F.col("_s").alias("_sa"))
    b = base.select(F.col("_id").alias("b_id"), F.col("_s").alias("_sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("edit_dist", F.levenshtein("_sa", "_sb").cast("bigint"))
        .filter(F.col("edit_dist") <= k)
        .select("a_id", "b_id", "edit_dist")
    )


def _rows(df):
    return sorted((r.a_id, r.b_id, r.edit_dist) for r in df.collect())


@pytest.mark.parametrize("impl", IMPLS, ids=IMPL_IDS)
def test_equals_naive_on_documents(spark, sf_dir, impl):
    d = table(spark, sf_dir, "documents").limit(300)
    for k in (1, 2):
        want = _rows(_naive(spark, d, k))
        got = _rows(impl(d, k=k))
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"


@pytest.mark.parametrize("impl", IMPLS, ids=IMPL_IDS)
def test_adversarial_shapes(spark, impl):
    rows = [
        (1, "the quick brown fox jumps over the lazy"),
        (2, "the quick brown fox jumps over the hazy"),   # 1 sub from 1
        (3, "spam spam spam spam spam spam spam spam"),   # repetitive
        (4, "spam spam spam spam spam spam spam spXm"),   # 1 sub from 3
        (5, ""),                                          # empty
        (6, "a"),                                         # ED 1 from empty
        (7, "ab"),                                        # short
        (8, "ba"),                                        # ED 2 from 7
        (9, "\x01\x01ab"),                                # sentinel collision
        (10, "the quick brown fox jumps over the lazy"),  # exact dup of 1
        (11, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"), # unrelated long
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2, 3):
        want = _rows(_naive(spark, d, k))
        got = _rows(impl(d, k=k))
        assert got == want, f"k={k}"
    got2 = {(a, b): e for a, b, e in _rows(impl(d, k=2))}
    assert got2[(1, 2)] == 1 and got2[(3, 4)] == 1
    assert got2[(5, 6)] == 1 and got2[(7, 8)] == 2 and got2[(1, 10)] == 0


@pytest.mark.parametrize("impl", IMPLS, ids=IMPL_IDS)
def test_random_differential(spark, impl):
    """Tiny alphabet maximizes gram collisions and repetition — the
    hostile regime for positional count filters."""
    rng = random.Random(42)
    rows = [
        (i, "".join(rng.choice("ab ") for _ in range(rng.randint(0, 14))))
        for i in range(120)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2):
        want = _rows(_naive(spark, d, k))
        got = _rows(impl(d, k=k))
        assert got == want, f"k={k}: missing={set(want)-set(got)}"


@pytest.mark.parametrize("impl", IMPLS, ids=IMPL_IDS)
def test_short_stratum_guard(spark, impl):
    """A short-string population above max_short_rows must raise (never
    silently build the all-pairs plan); opting out still works."""
    rows = [(i, "ab"[: i % 3]) for i in range(50)]  # all len <= 2 (short)
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="short-string stratum"):
        impl(d, k=1, max_short_rows=10)
    # explicit opt-out: exactness unchanged vs naive
    got = _rows(impl(d, k=1, max_short_rows=None))
    want = _rows(_naive(spark, d, 1))
    assert got == want


@pytest.mark.parametrize("impl", IMPLS, ids=IMPL_IDS)
def test_boundary_stratum_pairs(spark, impl):
    """Pairs straddling the short/long stratum cut (len 8 vs len 9/10)
    must be found — the long side indexes, the short side must still
    probe."""
    rows = [
        (1, "abcdefgh"),        # len 8 (short stratum)
        (2, "abcdefghi"),       # len 9 (long) — ED 1 from 1
        (3, "abcdefghij"),      # len 10 (long) — ED 2 from 1
        (4, "abcdefghijk"),     # len 11 — ED 3 from 1 (excluded at k=2)
        (5, "zbcdefgh"),        # len 8 — ED 1 from 1 (short x short)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2):
        want = _rows(_naive(spark, d, k))
        got = _rows(impl(d, k=k))
        assert got == want, f"k={k}: missing={set(want)-set(got)}"
