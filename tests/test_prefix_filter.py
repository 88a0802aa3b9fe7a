"""Prefix-filtered set-similarity join ≡ naive per-block self-join.

ngram_jaccard_pairs selects its candidate strategy adaptively (naive below
``naive_block_max`` docs per block, AllPairs/PPJoin prefix filtering
above). The two paths must produce IDENTICAL output — the prefix filter
is a lossless candidate pruning, not an approximation. Forcing each path
on the same inputs pins that, including on the real documents table and
on adversarial shapes (empty docs, identical docs, single-token docs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.operators.dedup import ngram_jaccard_pairs


def _sorted_rows(df):
    return sorted(
        (r.a_id, r.b_id, round(r.jaccard, 9))
        for r in df.collect()
    )


def test_prefix_equals_naive_on_documents(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    naive = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=10**9
    )
    prefix = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=0
    )
    assert _sorted_rows(naive) == _sorted_rows(prefix)


def test_prefix_equals_naive_threshold_sweep(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(200)
    for t in (0.3, 0.7, 0.9):
        naive = ngram_jaccard_pairs(
            d, block_col="lang", threshold=t, naive_block_max=10**9
        )
        prefix = ngram_jaccard_pairs(
            d, block_col="lang", threshold=t, naive_block_max=0
        )
        assert _sorted_rows(naive) == _sorted_rows(prefix), f"t={t}"


def test_prefix_adversarial_shapes(spark):
    rows = [
        (1, "b", "a b c d"),
        (2, "b", "a b c d"),          # identical pair
        (3, "b", "a b c e"),          # 3/5 overlap with 1,2
        (4, "b", ""),                 # empty doc — never pairs
        (5, "b", "zzz"),              # single unique token
        (6, "b", "zzz"),              # identical single-token pair
        (7, "c", "a b c d"),          # other block — never pairs with 1
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    naive = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=10**9
    )
    prefix = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=0
    )
    got = _sorted_rows(prefix)
    assert got == _sorted_rows(naive)
    assert (1, 2, 1.0) in got and (5, 6, 1.0) in got
    assert not any(4 in (a, b) for a, b, _ in got)
    assert not any({a, b} == {1, 7} for a, b, _ in got)


def test_bucket_guard_preserves_planted_clusters(spark):
    """bucket_pair_max (the clustering scale guard): on planted duplicate
    GROUPS sharing one common high-frequency token (the mixed-bucket worst
    case), connected components over guarded pairs must equal components
    over exact pairs — every group stays one cluster, no cross-group
    merge. Guard forced to bind (bucket_pair_max=2, prefix path forced)."""
    from corintick_spark.operators.dup_clusters import connected_components

    rows = []
    did = 0
    # 6 groups of 8 near-identical docs; every doc also contains the
    # common token "corpus" so all of them meet in one big mixed bucket
    for g in range(6):
        base = [f"g{g}tok{j}" for j in range(10)]
        for c in range(8):
            toks = list(base)
            toks[9] = f"g{g}copy{c}"  # one差 token per copy -> J = 9/11 > 0.5
            rows.append((did, "b", "corpus " + " ".join(toks)))
            did += 1
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def comp_sets(pairs):
        comps = connected_components(pairs)
        groups = {}
        for r in comps.collect():
            groups.setdefault(r["comp"], set()).add(r["node"])
        return {frozenset(v) for v in groups.values()}

    exact = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=0
    ).select("a_id", "b_id")
    guarded = ngram_jaccard_pairs(
        d, block_col="source", threshold=0.5, naive_block_max=0,
        bucket_pair_max=2,
    ).select("a_id", "b_id")
    assert comp_sets(exact) == comp_sets(guarded)
    assert len(comp_sets(exact)) == 6
