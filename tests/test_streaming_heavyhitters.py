"""Streaming Misra-Gries heavy hitters: the sketch's guarantees, checked
against exact batch counts.

Pinned properties (streaming/stateful.py::heavy_hitters):
1. estimates never OVERcount, and undercount by at most shard_n/(k+1);
2. every token whose true shard frequency exceeds shard_n/(k+1) is
   present in the final summary (the heavy-hitter guarantee);
3. summaries are bounded at k counters per shard — state never scales
   with vocabulary;
4. two runs produce identical output (the merge step is order-free, so
   determinism needs only the replay's fixed batch boundaries)."""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.registry import load_all

QUERIES = load_all()
K, SHARDS = 20, 8


def _exact_shard_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.select(
            F.pmod(F.xxhash64("token"), F.lit(SHARDS)).cast("int").alias("shard"),
            "token",
        )
        .groupBy("shard", "token")
        .count()
        .collect()
    )


def test_mg_guarantees_vs_exact(spark, sf_dir):
    got = QUERIES["stream_heavyhitters"].spark(spark, sf_dir).collect()
    est = {(r.shard, r.token): r.est_count for r in got}
    exact_rows = _exact_shard_counts(spark, sf_dir)
    true = {(r.shard, r.token): r["count"] for r in exact_rows}
    shard_n = {}
    for (s, _), c in true.items():
        shard_n[s] = shard_n.get(s, 0) + c

    # bounded state
    per_shard = {}
    for s, t in est:
        per_shard[s] = per_shard.get(s, 0) + 1
    assert all(n <= K for n in per_shard.values())

    for (s, t), e in est.items():
        tr = true.get((s, t), 0)
        bound = shard_n[s] / (K + 1)
        assert e <= tr, f"overcount: {t} est={e} true={tr}"
        assert e >= tr - bound, f"undercount beyond bound: {t}"

    # heavy-hitter completeness: freq > shard_n/(k+1) must survive
    for (s, t), tr in true.items():
        if tr > shard_n[s] / (K + 1):
            assert (s, t) in est, f"heavy hitter lost: {t} freq={tr}"


def test_mg_deterministic(spark, sf_dir):
    a = QUERIES["stream_heavyhitters"].spark(spark, sf_dir).toPandas()
    b = QUERIES["stream_heavyhitters"].spark(spark, sf_dir).toPandas()
    assert a.equals(b)
    assert len(a) > 0
