"""Round-3 extension operators: per-group regression and per-entity anomaly
statistics from exact moments, linear time-series interpolation, and
benchmark-contamination screening.

corintick stored raw frames and left statistical derivation to client-side
pandas (SURVEY.md §2.1 verdict †); the contamination screen extends the
LLM-pipeline tier the same way the dedup/similarity stack does. Everything
here is JVM-side declarative DataFrame code — no Python in any hot path —
and every float result is derived from exact integer moments
(corintick_spark.exact rationale) so the DuckDB oracles hash-match
bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.catalog import table
from corintick_spark.registry import query


def _ssum(e, scale):
    """Exact scaled-long sum, returned as double (see exact.py)."""
    return F.sum(F.round(e * scale).cast("bigint")).cast("double") / scale


# Per-group simple linear regression (y = l_extendedprice on x = l_quantity)
# from exact integer moments — one hash aggregation with map-side partials,
# never a second pass over the data. The slope/intercept are single float
# expressions over exact moment doubles, so both engines compute identical
# IEEE results (the F.corr/regr_slope built-ins would NOT hash-match: their
# float accumulation order differs between engines).
@query(
    "agg_regression",
    sql="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sx,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sy,
               CAST(SUM(CAST(round(l_quantity * l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sxx,
               CAST(SUM(CAST(round(l_quantity * l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
                 / n, 6) AS intercept
    FROM m
    """,
)
def agg_regression(spark, sf_dir):
    """Per-returnflag OLS of extendedprice on quantity (exact moments)."""
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _ssum(F.col("l_quantity"), 100).alias("sx"),
        _ssum(F.col("l_extendedprice"), 100).alias("sy"),
        _ssum(F.col("l_quantity") * F.col("l_quantity"), 100).alias("sxx"),
        _ssum(F.col("l_quantity") * F.col("l_extendedprice"), 100).alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
    )


# Linear interpolation onto a regular grid — the pandas
# `resample().interpolate('time')` idiom corintick users ran client-side †,
# in-engine via one grid build + one two-direction window pass
# (operators/resample.py::resample_interp).
@query(
    "resample_interp",
    sql="""
    WITH bounds AS (
        -- FLOOR, not integer // (truncates toward zero): see resample_ffill
        SELECT user_id,
               CAST(FLOOR(epoch_us(MIN(ts)) / 3600000000.0) AS BIGINT) + 1 AS s0,
               CAST(FLOOR(epoch_us(MAX(ts)) / 3600000000.0) AS BIGINT) AS s1
        FROM events GROUP BY user_id
    ), grid AS (
        SELECT user_id, make_timestamp(CAST(s * 3600000000 AS BIGINT)) AS grid_ts
        FROM bounds, UNNEST(range(s0, s1 + 1)) t(s)
    ), pn AS (
        SELECT g.user_id, g.grid_ts,
               (SELECT e.value FROM events e
                WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pv,
               (SELECT epoch_us(e.ts) FROM events e
                WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pt,
               (SELECT e.value FROM events e
                WHERE e.user_id = g.user_id AND e.ts > g.grid_ts
                ORDER BY e.ts, e.event_id LIMIT 1) AS nv,
               (SELECT epoch_us(e.ts) FROM events e
                WHERE e.user_id = g.user_id AND e.ts > g.grid_ts
                ORDER BY e.ts, e.event_id LIMIT 1) AS nt
        FROM grid g
    )
    SELECT user_id, grid_ts,
           ROUND(COALESCE(pv + (nv - pv) * (CAST(epoch_us(grid_ts) - pt AS DOUBLE)
                                            / CAST(nt - pt AS DOUBLE)), pv),
                 6) AS interp_value
    FROM pn
    """,
)
def resample_interp(spark, sf_dir):
    """Hourly grid per uid with time-weighted linear interpolation."""
    from corintick_spark.operators.resample import resample_interp as _interp

    ev = table(spark, sf_dir, "events")
    return _interp(ev, key="user_id", ts="ts", value="value", step_s=3600)


# Per-user z-score anomaly detection from exact windowed moments — flags
# events more than 3σ from the user's mean. One exchange on user_id, whole
# partition frame (no sort needed beyond the hash partition), identical
# guarded float expressions in both engines.
@query(
    "events_anomaly",
    sql="""
    WITH m AS (
        SELECT event_id, user_id, ts, value,
               COUNT(value) OVER w AS n,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) OVER w AS DOUBLE)
                   / 1000000 AS sv,
               CAST(SUM(CAST(round(value * value * 1000) AS BIGINT)) OVER w AS DOUBLE)
                   / 1000 AS svv
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id, ts, value,
           ROUND((value - sv / n)
                 / SQRT(GREATEST(svv / n - (sv / n) * (sv / n), 0)), 6) AS zscore
    FROM m
    WHERE SQRT(GREATEST(svv / n - (sv / n) * (sv / n), 0)) > 0
      AND ABS(value - sv / n)
          > 3 * SQRT(GREATEST(svv / n - (sv / n) * (sv / n), 0))
    """,
)
def events_anomaly(spark, sf_dir):
    """Events beyond 3 sigma of their user's value distribution."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    m = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count("value").over(w).alias("n"),
        (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).over(w)
         .cast("double") / 1_000_000).alias("sv"),
        (F.sum(F.round(F.col("value") * F.col("value") * 1_000).cast("bigint"))
         .over(w).cast("double") / 1_000).alias("svv"),
    )
    mean = F.col("sv") / F.col("n")
    std = F.sqrt(F.greatest(F.col("svv") / F.col("n") - mean * mean, F.lit(0.0)))
    return (
        m.filter((std > 0) & (F.abs(F.col("value") - mean) > 3 * std))
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.round((F.col("value") - mean) / std, 6).alias("zscore"),
        )
    )


# Benchmark-contamination screen — the LLM-pipeline op that checks a corpus
# for verbatim n-gram overlap with a held-out benchmark set before training.
# Candidate generation is an equi-join on the 5-gram (the LSH-bucket shape,
# never all-pairs); the probe side is DISTINCT grams of the benchmark split,
# small by construction, so Spark broadcasts it and the corpus is never
# shuffled — the same 100 TB posture as dedup_minhash.
@query(
    "text_contamination",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(ws) AS tok,
               unnest(range(1, len(ws) + 1)) AS ord
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x != '') AS ws
              FROM documents)
    ), five AS (
        SELECT a.doc_id,
               a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok
                     || ' ' || e.tok AS gram
        FROM toks a
        JOIN toks b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
        JOIN toks c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
        JOIN toks d ON d.doc_id = a.doc_id AND d.ord = a.ord + 3
        JOIN toks e ON e.doc_id = a.doc_id AND e.ord = a.ord + 4
    ), u AS (
        SELECT DISTINCT doc_id, gram FROM five
    ), probe AS (
        SELECT DISTINCT gram FROM u WHERE doc_id % 97 = 0
    )
    SELECT u.doc_id, COUNT(*) AS n_shared
    FROM u JOIN probe USING (gram)
    WHERE u.doc_id % 97 <> 0
    GROUP BY u.doc_id
    """,
)
def text_contamination(spark, sf_dir):
    """Corpus docs sharing >= 1 distinct 5-gram with the benchmark split
    (doc_id % 97 == 0), with the shared-gram count."""
    from corintick_spark.operators.dedup import tokenize

    d = tokenize(table(spark, sf_dir, "documents"))
    grams = F.expr(
        "transform(slice(words, 1, size(words) - 4), (w, i) -> concat_ws(' ',"
        " w, element_at(words, i + 2), element_at(words, i + 3),"
        " element_at(words, i + 4), element_at(words, i + 5)))"
    )
    per_doc = d.filter(F.size("words") >= 5).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    probe = (
        per_doc.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        per_doc.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(probe), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )




# Iterative graph algorithm tier: weighted PageRank over the bipartite
# customer->supplier purchase graph (operators/pagerank.py — Pregel-shaped
# power iteration; edges partitioned once, rank table is the only thing
# shuffled per round). Float contribution sums are order-dependent in the
# last ulps, so no SQL oracle — rows-only driver check (row count = node
# count, deterministic) + numpy power-iteration differential in
# tests/test_operators.py.
@query("graph_pagerank", sql=None)
def graph_pagerank(spark, sf_dir):
    """Top-50 nodes by PageRank on the customer<->supplier purchase graph."""
    from corintick_spark.operators.pagerank import pagerank

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            F.col("w").cast("double").alias("w"),
        )
    )
    # bidirectional edges make the bipartite walk ergodic. Round 11
    # (guide §2.4): emit both directions from ONE pass via explode instead
    # of a union of two selects over the aggregation — the union shape
    # reuses the exchange but runs the final aggregation pass twice.
    # Identical rows.
    edges = cs.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst"), F.col("w")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.col("w"),
                ),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst", "ed.w")
    # 8 rounds in ONE job (checkpoint_every=8 — round 11's single-
    # reference steps make the plan linear in segment length); tol is a
    # safety-net early exit — with damping 0.85 the L1 delta contracts
    # ~0.85x/round (measured at sf0.001/0.01/0.1: 0.91 after round 4,
    # 0.48 after round 8), so it never fires inside a bench-budget
    # iteration count and the K=4 -> 8 boundary change cannot alter the
    # result (differential-pinned: rounded-8dp ranks identical).
    # merge_parallel=False (round 11): each union half is keyed on its
    # groupBy endpoints and the "c"/"s" prefixes make the two halves'
    # (src, dst) spaces disjoint, so the edge list is one-row-per-pair by
    # construction — the operator's merge shuffle would re-aggregate
    # 2x|pairs| rows to themselves.
    r = pagerank(
        edges, weight="w", damping=0.85, iterations=8, tol=1e-4,
        checkpoint_every=8, merge_parallel=False,
    )
    # rows-only invariant: PageRank is a probability distribution — the
    # FULL rank vector (pre-limit) sums to 1 and every rank is positive.
    # Both ride along as columns (1-row broadcast) so the rows-only check
    # carries its own adjudication.
    tot = r.agg(
        F.sum("rank").alias("inv_rank_sum"), F.min("rank").alias("_minr")
    )
    return (
        r.orderBy(F.desc("rank"), "node")
        .limit(50)
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.round("rank", 8).alias("rank"),
            F.round("inv_rank_sum", 9).alias("inv_rank_sum"),
            (
                (F.abs(F.col("inv_rank_sum") - F.lit(1.0)) < F.lit(1e-6))
                & (F.col("_minr") > F.lit(0.0))
            ).alias("inv_ok"),
        )
    )


# Rolling median — the robust tick-data smoother (median filters shrug off
# the outliers that wreck rolling means). Spark has no median window
# function; the sorted-array formulation (collect_list over a bounded
# 25-row frame -> sort_array -> explicit middle/interpolate) stays JVM-side
# and bounds per-row state at frame size. Both engines index identical
# sorted arrays with the same formula, so even the even-count interpolation
# halves are bit-equal.
@query(
    "window_rolling_median",
    sql="""
    SELECT event_id, user_id, ts,
           CASE WHEN len(a) % 2 = 1 THEN a[(len(a) + 1) // 2]
                ELSE (a[len(a) // 2] + a[len(a) // 2 + 1]) / 2.0
           END AS roll_median
    FROM (SELECT event_id, user_id, ts,
                 list_sort(list(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) AS a
          FROM events WHERE value IS NOT NULL)
    """,
)
def window_rolling_median(spark, sf_dir):
    """25-tick rolling median of event values per user (null ticks are not
    observations: filtered up front in both engines — Spark's collect_list
    would silently skip them while DuckDB's list() keeps them)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, Window.currentRow)
    )
    a = F.sort_array(F.collect_list("value").over(w))
    n = F.size(a)
    med = F.when(
        n % 2 == 1, F.element_at(a, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(a, (n / 2).cast("int"))
            + F.element_at(a, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return ev.select("event_id", "user_id", "ts", med.alias("roll_median"))


# Deterministic fixed-size sample — the distributed reservoir-sample
# equivalent: order by a Knuth multiplicative hash (engine-portable pure
# int64 arithmetic, uniform over ids) and take k. Spark plans
# TakeOrderedAndProject: each partition keeps its local top-k and only
# k rows per partition reach the driver-side merge — no global sort, no
# full shuffle, the right 100 TB shape for "give me a reproducible 100-doc
# eval set".
@query(
    "sample_fixed_k",
    sql="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
    LIMIT 100
    """,
)
def sample_fixed_k(spark, sf_dir):
    """Reproducible uniform 100-doc sample (hash-ordered top-k)."""
    d = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        d.orderBy(h, "doc_id")
        .limit(100)
        .select("doc_id", "lang", "source", "n_chars")
    )


# Linear-model scoring over embedding columns — the batch-inference shape
# of a training-data pipeline (classifier-based quality filtering) without
# leaving the JVM: the weight vector is zipped against the embedding and
# folded with an INTEGER accumulator (vector_norms technique), so scores
# are order-independent and bit-identical across engines. No mapInPandas
# hop; at 100 TB this is a narrow map + TakeOrderedAndProject. Weights are
# derived deterministically per dimension (a fixed pseudo-random vector)
# so both engines build the identical model inline.
@query(
    "ml_linear_score",
    sql="""
    WITH s AS (
        SELECT vec_id, label,
               CAST(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(round(CAST(embedding[i] AS DOUBLE)
                              * (CAST((i * 2654435761) % 1000 AS DOUBLE) / 1000.0 - 0.5)
                              * 1000000) AS BIGINT))) AS DOUBLE) / 1000000 AS margin
        FROM embeddings
    )
    SELECT vec_id, label, ROUND(margin, 6) AS margin, margin > 0 AS pred
    FROM s
    ORDER BY margin DESC, vec_id LIMIT 20
    """,
)
def ml_linear_score(spark, sf_dir):
    """Top-20 embeddings by deterministic linear-model margin."""
    e = table(spark, sf_dir, "embeddings")
    margin = F.expr(
        "cast(aggregate(zip_with(embedding, sequence(1, size(embedding)),"
        " (x, i) -> cast(round(cast(x as double)"
        " * (cast((i * 2654435761) % 1000 as double) / 1000.0 - 0.5)"
        " * 1000000) as bigint)),"
        " cast(0 as bigint), (acc, v) -> acc + v) as double) / 1000000"
    )
    s = e.select("vec_id", "label", margin.alias("margin"))
    return (
        s.orderBy(F.desc("margin"), "vec_id")
        .limit(20)
        .select(
            "vec_id",
            "label",
            F.round("margin", 6).alias("margin"),
            (F.col("margin") > 0).alias("pred"),
        )
    )


# Exponentially-weighted moving average — the pandas `ewm(alpha).mean()`
# tick idiom (recursive form, seeded with the frame's oldest value) over a
# bounded 20-tick window. The recursion acc = 0.2*x + 0.8*acc is a
# left-to-right fold over the frame-ordered value list: Spark's
# aggregate() seeded with element 1 and DuckDB's list_reduce() execute the
# IDENTICAL sequence of IEEE multiply/adds, so results are bit-equal with
# no scaling tricks. Bounded frame = bounded per-row state; one exchange
# on user_id.
@query(
    "window_ewma",
    sql="""
    SELECT event_id, user_id, ts,
           ROUND(list_reduce(a, (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ewma
    FROM (SELECT event_id, user_id, ts,
                 list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
          FROM events WHERE value IS NOT NULL)
    """,
)
def window_ewma(spark, sf_dir):
    """20-tick EWMA (alpha=0.2) of event values per user (null ticks
    filtered up front in both engines — see window_rolling_median)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    a = F.collect_list("value").over(w)
    ewma = F.expr(
        "aggregate(slice(a, 2, size(a) - 1), a[0],"
        " (acc, x) -> 0.2D * x + 0.8D * acc)"
    )
    return (
        ev.select("event_id", "user_id", "ts", a.alias("a"))
        .select("event_id", "user_id", "ts", F.round(ewma, 6).alias("ewma"))
    )


# Class-balance entropy — the training-data diversity metric (how evenly a
# user's events spread across types). H = log2(T) - (1/T)*sum(c_i*log2(c_i))
# needs only per-(user,type) counts: one partial-aggregated shuffle, then a
# tiny per-user agg. The c_i*log2(c_i) terms are exact functions of integer
# counts, and their SUM is made order-independent with the scaled-long
# trick, so H is bit-equal across engines (q6-floor-quantized on top).
@query(
    "agg_entropy",
    sql="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ), m AS (
        SELECT user_id,
               SUM(cnt) AS total,
               COUNT(*) AS n_types,
               CAST(SUM(CAST(round(cnt * log2(cnt) * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS s
        FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(total AS BIGINT) AS total, n_types,
           FLOOR((log2(total) - s / total) * 1000000) / 1000000 AS entropy
    FROM m
    """,
)
def agg_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type distribution (bits)."""
    from corintick_spark.exact import q6

    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = c.groupBy("user_id").agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_types"),
        (
            F.sum(
                F.round(F.col("cnt") * F.log2(F.col("cnt")) * 1_000_000).cast(
                    "bigint"
                )
            ).cast("double")
            / 1_000_000
        ).alias("s"),
    )
    return m.select(
        "user_id",
        F.col("total").cast("bigint").alias("total"),
        "n_types",
        q6(F.log2(F.col("total")) - F.col("s") / F.col("total")).alias("entropy"),
    )


# Context-window sequence packing — the training-data op that turns a doc
# stream into fixed-token-budget bins (greedy streaming pack: a doc goes to
# bin floor(exclusive_prefix_tokens / BUDGET) within its source, ordered by
# doc_id). One window pass over an exclusive running sum + one aggregation;
# at 100 TB both shuffles key on source, and the per-bin summary (not the
# packed text) is what crosses the wire.
@query(
    "pack_sequences",
    sql="""
    WITH t AS (
        SELECT doc_id, source,
               COALESCE(len(list_filter(string_split(text, ' '),
                                        x -> x != '')), 0) AS n_tokens
        FROM documents
    ), p AS (
        SELECT doc_id, source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        FROM t
    )
    SELECT source,
           CAST(FLOOR(prefix / 4096.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM p
    GROUP BY source, bin_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Greedy 4096-token context packing per source: bin assignment from an
    exclusive prefix sum of whitespace token counts, summarized per bin."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.coalesce(
            F.size(F.expr("filter(split(text, ' '), x -> x != '')")), F.lit(0)
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = t.withColumn("prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        p.groupBy(
            "source",
            F.floor(F.col("prefix") / 4096.0).cast("bigint").alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# Per-key winsorization — clip each user's values to their own [p5, p95]
# band (the robust-stats preprocessing step before z-scoring a heavy-tailed
# metric). Exact interpolated percentiles per key (one agg), joined back
# broadcast (the stats side is |keys| rows), clip is a pure CASE so NULL
# values pass through identically in both engines.
@query(
    "window_winsorize",
    sql="""
    WITH s AS (
        SELECT user_id,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           ROUND(CASE WHEN e.value IS NULL THEN NULL
                      WHEN e.value < s.lo THEN s.lo
                      WHEN e.value > s.hi THEN s.hi
                      ELSE e.value END, 6) AS clipped
    FROM events e JOIN s USING (user_id)
    """,
)
def window_winsorize(spark, sf_dir):
    """Values clipped to the user's own 5th..95th percentile band."""
    ev = table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clip = (
        F.when(F.col("value").isNull(), F.lit(None).cast("double"))
        .when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    return (
        ev.join(F.broadcast(s), "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(clip, 6).alias("clipped"),
        )
    )


# Deterministic fixed-k sample PER GROUP — the "k examples per class"
# sampler (eval-set building, per-language inspection). Same portable
# Knuth-hash ordering as sample_fixed_k, but ranked within each group: a
# parallel window partitioned by the group key, never a global sort. At
# scale Spark plans WindowGroupLimit (rank pushdown) so only k rows per
# group survive the exchange.
@query(
    "sample_per_group",
    sql="""
    SELECT doc_id, lang, source, rk
    FROM (
        SELECT doc_id, lang, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    )
    WHERE rk <= 10
    """,
)
def sample_per_group(spark, sf_dir):
    """10 hash-selected docs per language (reproducible per-class sample)."""
    d = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 10)
    )


# Context packing WITH document splitting — the real training packer:
# a doc whose tokens cross a 4096 boundary contributes a fragment to each
# window it spans (pack_sequences only assigns whole docs to the bin where
# they start). Fully declarative despite the "sequential" feel: the
# exclusive prefix sum fixes each doc's global token interval, and the
# fragment set is just that interval exploded over the windows it
# intersects — one window pass + one explode, no fold. Fragment sizes are
# interval intersections (pure integer arithmetic, identical in both
# engines).
@query(
    "pack_fragments",
    sql="""
    WITH t AS (
        SELECT doc_id, source,
               COALESCE(len(list_filter(string_split(text, ' '),
                                        x -> x != '')), 0) AS n
        FROM documents
    ), p AS (
        SELECT doc_id, source, n,
               COALESCE(SUM(n) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prefix
        FROM t
    ), f AS (
        SELECT doc_id, source, n, prefix,
               CAST(FLOOR(prefix / 4096.0) AS BIGINT) AS b0,
               CAST(FLOOR((prefix + n - 1) / 4096.0) AS BIGINT) AS b1
        FROM p WHERE n > 0
    )
    SELECT source, doc_id, b AS bin_id,
           CAST(b - b0 AS BIGINT) AS frag_idx,
           CAST(LEAST(prefix + n, (b + 1) * 4096)
                - GREATEST(prefix, b * 4096) AS BIGINT) AS frag_tokens
    FROM f, UNNEST(range(b0, b1 + 1)) u(b)
    """,
)
def pack_fragments(spark, sf_dir):
    """4096-token context packing with cross-boundary document splitting:
    one fragment row per (doc, spanned window)."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.coalesce(
            F.size(F.expr("filter(split(text, ' '), x -> x != '')")), F.lit(0)
        ).alias("n"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = t.withColumn("prefix", F.coalesce(F.sum("n").over(w), F.lit(0)))
    f = (
        p.filter(F.col("n") > 0)
        .withColumn("b0", F.floor(F.col("prefix") / 4096.0).cast("bigint"))
        .withColumn(
            "b1", F.floor((F.col("prefix") + F.col("n") - 1) / 4096.0).cast("bigint")
        )
    )
    frag_tokens = F.least(
        F.col("prefix") + F.col("n"), (F.col("b") + 1) * 4096
    ) - F.greatest(F.col("prefix"), F.col("b") * 4096)
    return (
        f.select(
            "source", "doc_id", "prefix", "n", "b0",
            F.explode(F.sequence("b0", "b1")).alias("b"),
        )
        .select(
            "source",
            "doc_id",
            F.col("b").alias("bin_id"),
            (F.col("b") - F.col("b0")).cast("bigint").alias("frag_idx"),
            frag_tokens.cast("bigint").alias("frag_tokens"),
        )
    )


# Numeric table profiler — the ANALYZE/data-quality pass every pipeline
# runs before training: null share, exact distinct count, min/max, exact
# scaled-long totals, per numeric column. One stack() explode (JVM
# generator, no Python) melts the columns, then a single partial-aggregated
# shuffle keyed by column name — |columns| output rows regardless of table
# size. The oracle is the literal per-column UNION ALL.
@query(
    "profile_numeric",
    sql="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n, COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS ndv,
           MIN(l_quantity) AS vmin, MAX(l_quantity) AS vmax,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
               AS total
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice),
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount),
           CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           MIN(l_tax), MAX(l_tax),
           CAST(SUM(CAST(round(l_tax * 100) AS BIGINT)) AS DOUBLE) / 100
    FROM lineitem
    """,
)
def profile_numeric(spark, sf_dir):
    """Per-column numeric profile of lineitem (null share, exact NDV,
    min/max, exact total) in one stacked pass."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    stacked = li.select(
        F.expr(
            "stack(4, " + ", ".join(f"'{c}', {c}" for c in cols) + ") AS (col, v)"
        )
    )
    return stacked.groupBy("col").agg(
        F.count("*").alias("n"),
        F.count("v").alias("n_nonnull"),
        F.countDistinct("v").alias("ndv"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        (F.sum(F.round(F.col("v") * 100).cast("bigint")).cast("double") / 100).alias(
            "total"
        ),
    )


# Gini coefficient per event type over per-user value mass — the
# inequality/imbalance metric (is one user dominating the stream? is a
# source dominating the corpus?). Sorted-rank formula
# G = 2*Σ(i·x_i)/(n·Σx) - (n+1)/n over ascending (x, user_id) ranks; both
# Σ terms go through scaled-long integers so the only floats are the
# final identical expressions. One exchange for the per-user sums, one
# rank window, one aggregation.
@query(
    "agg_gini",
    sql="""
    WITH s AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS x
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, user_id
    ), r AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x, user_id) AS i
        FROM s
    ), g AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS sx,
               CAST(SUM(i * CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS six
        FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(2 * six / NULLIF(n * sx, 0) - (n + 1.0) / n, 6) AS gini
    FROM g
    """,
)
def agg_gini(spark, sf_dir):
    """Gini coefficient of per-user value mass within each event type."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.groupBy("event_type", "user_id").agg(
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double")
            / 1_000_000
        ).alias("x")
    )
    r = s.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "user_id"))
        .alias("i"),
    )
    g = r.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("x") * 1_000_000).cast("bigint")).cast("double")
            / 1_000_000
        ).alias("sx"),
        (
            F.sum(F.col("i") * F.round(F.col("x") * 1_000_000).cast("bigint")).cast(
                "double"
            )
            / 1_000_000
        ).alias("six"),
    )
    gini = 2 * F.col("six") / F.nullif(F.col("n") * F.col("sx"), F.lit(0.0)) - (
        F.col("n") + 1.0
    ) / F.col("n")
    return g.select("event_type", "n", F.round(gini, 6).alias("gini"))


# Median absolute deviation per group — the robust dispersion measure
# (outlier-resistant counterpart to agg_stats' stddev; winsorize's
# natural partner). Two exact interpolated medians: one per group, one
# over the absolute deviations after a broadcast join of the |groups|-row
# median table back onto the facts.
@query(
    "agg_mad",
    sql="""
    WITH m AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           ROUND(ANY_VALUE(m.med), 6) AS med,
           ROUND(quantile_cont(ABS(e.value - m.med), 0.5), 6) AS mad
    FROM events e JOIN m USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def agg_mad(spark, sf_dir):
    """Median absolute deviation of value per event type (exact medians)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(
                F.expr("percentile(abs(value - med), 0.5)"), 6
            ).alias("mad"),
        )
    )


# Source-pair vocabulary overlap — the corpus-diversity diagnostic (are
# two ingestion sources the same crawl in disguise?). Vocabularies are
# per-source distinct token sets built with ONE aggregation; the 20x20
# pair comparison joins the |sources|-row vocab table against itself —
# the corpus is never pair-joined, only its per-source summaries.
@query(
    "source_overlap",
    sql="""
    WITH v AS (
        SELECT source, list_sort(list_distinct(flatten(
                   list(list_filter(string_split(text, ' '), x -> x != ''))
               ))) AS vocab
        FROM documents GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(len(list_intersect(a.vocab, b.vocab)) AS BIGINT) AS shared,
           ROUND(len(list_intersect(a.vocab, b.vocab))
                 / CAST(len(list_distinct(a.vocab || b.vocab)) AS DOUBLE),
                 6) AS jaccard
    FROM v a JOIN v b ON a.source < b.source
    """,
)
def source_overlap(spark, sf_dir):
    """Vocabulary Jaccard for every source pair (corpus diversity)."""
    d = table(spark, sf_dir, "documents")
    v = (
        d.select(
            "source", F.expr("filter(split(text, ' '), x -> x != '')").alias("w")
        )
        .groupBy("source")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("w")))
            ).alias("vocab")
        )
    )
    a = v.select(F.col("source").alias("src_a"), F.col("vocab").alias("va"))
    b = v.select(F.col("source").alias("src_b"), F.col("vocab").alias("vb"))
    inter = F.size(F.array_intersect("va", "vb"))
    union = F.size(F.array_distinct(F.concat("va", "vb")))
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            inter.cast("bigint").alias("shared"),
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
    )


# Tukey-fence outlier census — the boxplot rule (beyond Q1-1.5*IQR or
# Q3+1.5*IQR) per event type: exact interpolated quartiles in one
# aggregation, fences as pure float expressions, then a conditional
# re-count against the |groups|-row broadcast. The robust-stats family's
# third member alongside winsorize (clip) and MAD (dispersion).
@query(
    "agg_iqr_outliers",
    sql="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           ROUND(ANY_VALUE(q.q1), 6) AS q1,
           ROUND(ANY_VALUE(q.q3), 6) AS q3,
           CAST(COALESCE(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                                    OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_outliers
    FROM events e JOIN q USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def agg_iqr_outliers(spark, sf_dir):
    """Boxplot-rule outlier counts per event type (exact quartiles)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("q1"), 6).alias("q1"),
            F.round(F.any_value("q3"), 6).alias("q3"),
            F.coalesce(
                F.sum(F.when(is_out, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# Top-N concentration share — Gini's blunt cousin: what fraction of each
# event type's value mass do its 10 heaviest users carry? Per-user sums
# (exact scaled-long), rank within type (WindowGroupLimit prunes to 10
# per group before the exchange completes), then the top-10 sum over the
# broadcast per-type totals.
@query(
    "agg_topn_share",
    sql="""
    WITH s AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS x
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, user_id
    ), r AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x DESC, user_id) AS rk
        FROM s
    ), t AS (
        SELECT event_type,
               CAST(SUM(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 AS total,
               COUNT(*) AS n_users
        FROM s GROUP BY event_type
    )
    SELECT r.event_type, ANY_VALUE(t.n_users) AS n_users,
           ROUND(CAST(SUM(CAST(round(r.x * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000, 6) AS top10_value,
           ROUND(CAST(SUM(CAST(round(r.x * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000 / NULLIF(ANY_VALUE(t.total), 0), 6) AS top10_share
    FROM r JOIN t USING (event_type)
    WHERE r.rk <= 10
    GROUP BY r.event_type
    """,
)
def agg_topn_share(spark, sf_dir):
    """Share of each event type's value mass held by its top-10 users."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ssum = lambda c: (
        F.sum(F.round(F.col(c) * 1_000_000).cast("bigint")).cast("double")
        / 1_000_000
    )
    s = ev.groupBy("event_type", "user_id").agg(ssum("value").alias("x"))
    r = s.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(F.desc("x"), "user_id"))
        .alias("rk"),
    ).filter(F.col("rk") <= 10)
    t = s.groupBy("event_type").agg(
        ssum("x").alias("total"), F.count("*").alias("n_users")
    )
    return (
        r.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n_users").alias("n_users"),
            F.round(ssum("x"), 6).alias("top10_value"),
            F.round(
                ssum("x") / F.nullif(F.any_value("total"), F.lit(0.0)), 6
            ).alias("top10_share"),
        )
    )


# Data-quality verification suite (operators/dq.py) — the batch-gating
# checks a 100 TB ingestion pipeline runs before committing a write: all
# row-level checks over events compile into ONE aggregate pass
# (conditional aggregates in a single hash agg), the referential check is
# one left-anti join aggregate. The oracle recomputes every check in SQL;
# the edge dataset's planted orphan lineitems make the RI check's
# violation path observable under the driver.
@query(
    "dq_suite",
    sql="""
    WITH ev AS (
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT event_id) AS d,
               COUNT(value) AS nn,
               SUM(CASE WHEN value IS NULL
                         OR (value >= -100000 AND value <= 100000)
                        THEN 1 ELSE 0 END) AS rng,
               SUM(CASE WHEN event_type IN
                        ('view', 'click', 'purchase', 'refund')
                        THEN 1 ELSE 0 END) AS dom
        FROM events
    ), li AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v
        FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
    )
    SELECT 'event_id_unique' AS check_name, CAST(d AS BIGINT) AS metric,
           CAST(n - d AS BIGINT) AS violations, n - d = 0 AS passed FROM ev
    UNION ALL
    SELECT 'value_complete_90', CAST(nn AS BIGINT), CAST(n - nn AS BIGINT),
           nn * 1000000 >= n * 900000 FROM ev
    UNION ALL
    SELECT 'value_range', CAST(rng AS BIGINT), CAST(n - rng AS BIGINT),
           n - rng = 0 FROM ev
    UNION ALL
    SELECT 'event_type_domain', CAST(dom AS BIGINT), CAST(n - dom AS BIGINT),
           n - dom = 0 FROM ev
    UNION ALL
    SELECT 'lineitem_order_ref', CAST(n - v AS BIGINT), CAST(v AS BIGINT),
           v = 0 FROM li
    ORDER BY check_name
    """,
)
def dq_suite(spark, sf_dir):
    """Five-check DQ gate: uniqueness, completeness budget, value range,
    categorical domain (one pass over events) + lineitem->orders
    referential integrity (one anti-join aggregate)."""
    from corintick_spark.operators.dq import (
        Complete,
        InRange,
        Satisfies,
        Unique,
        compile_checks,
        referential_check,
    )

    ev = table(spark, sf_dir, "events")
    row_level = compile_checks(
        ev,
        [
            Unique(("event_id",), name="event_id_unique"),
            Complete("value", ratio=0.9, name="value_complete_90"),
            InRange("value", -100_000, 100_000, name="value_range"),
            Satisfies(
                "event_type IN ('view','click','purchase','refund')",
                name="event_type_domain",
            ),
        ],
    )
    ri = referential_check(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        "l_orderkey",
        "o_orderkey",
        name="lineitem_order_ref",
    )
    return row_level.unionByName(ri).orderBy("check_name")


# Count-Min sketch (operators/sketch_cm.py) — the mergeable approximate
# frequency counter completing the sketch tier (HLL = distinct counts,
# Misra-Gries = heavy hitters, CM = point frequencies over unbounded
# domains in depth x width fixed space). Construction-specific hashing →
# rows-only; the one-sided-error bound, EXACT cell-wise mergeability, and
# fixed-seed determinism are pinned by tests/test_sketch_cm.py.
@query("agg_cm_sketch", sql=None)
def agg_cm_sketch(spark, sf_dir):
    """Per-user CM frequency estimates (4x8192 sketch) next to the exact
    count — est >= exact for every user by construction."""
    from corintick_spark.operators.sketch_cm import cm_build, cm_estimate

    ev = table(spark, sf_dir, "events")
    sketch = cm_build(ev, "user_id")
    est = cm_estimate(sketch, ev.select("user_id").distinct(), "user_id")
    exact = ev.filter(F.col("user_id").isNotNull()).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_count",
            "est_count",
            # CM's one-sided error is DETERMINISTIC: est >= exact always
            # (collisions only add). inv_overshoot makes the error visible;
            # inv_ok false in any row means the sketch is broken.
            (F.col("est_count") - F.col("exact_count")).alias("inv_overshoot"),
            (F.col("est_count") >= F.col("exact_count")).alias("inv_ok"),
        )
        .orderBy("user_id")
    )


# Exact median WITHOUT a global sort (operators/quantile.py): iterative
# bucket selection — each pass is one partial-aggregated 65,536-bucket
# histogram (map-side combine; <=65,536 rows cross the wire), the rank
# recurses into the owning bucket; 2-3 passes for any integer domain. The
# 100 TB exact-quantile shape: no range exchange, no per-group value
# buffers. Prices are scaled to integer cents so bucket arithmetic is
# exact; the oracle is the textbook ROW_NUMBER selection at rank
# ceil(n/2).
@query(
    "agg_exact_median",
    sql="""
    WITH v AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), r AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn,
               COUNT(*) OVER () AS n
        FROM v
    )
    SELECT CAST(x AS DOUBLE) / 100 AS median_price,
           CAST(n AS BIGINT) AS n_rows
    FROM r WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    """,
)
def agg_exact_median(spark, sf_dir):
    """Exact median lineitem price by distributed bucket selection."""
    from corintick_spark.operators.quantile import exact_quantile

    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    # with_count (round 11): the count rides the operator's single
    # min/max/count stats pass — the old shape paid the same full scan
    # THREE times (query-level count, exact_quantile's count, the
    # kth-selection head) for one number each
    med, n = exact_quantile(li, "cents", 0.5, with_count=True)
    return spark.createDataFrame(
        [(med / 100.0, n)], "median_price double, n_rows bigint"
    )


# Per-group exact median, all groups at once (operators/quantile.py::
# grouped_quantile): every refinement pass is ONE histogram aggregation
# keyed by (group, bucket) with per-group ranges entering as a broadcast
# bounds table — pass count is max-over-groups (2-3), never #groups; no
# sort, no per-group value buffers (what percentile() would allocate).
# Bounded-group-cardinality contract (GROUPS_MAX) since per-group results
# are driver-sized by definition. Oracle: ROW_NUMBER selection per
# partition at rank ceil(n/2).
@query(
    "agg_group_median",
    sql="""
    WITH v AS (
        SELECT l_returnflag || '/' || l_linestatus AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), r AS (
        SELECT grp, x,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM v
    )
    SELECT grp, CAST(x AS DOUBLE) / 100 AS median_price
    FROM r WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    ORDER BY grp
    """,
)
def agg_group_median(spark, sf_dir):
    """Exact median price per (returnflag, linestatus) by simultaneous
    grouped bucket selection."""
    from corintick_spark.operators.quantile import grouped_quantile

    li = table(spark, sf_dir, "lineitem").select(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    med = grouped_quantile(li, "grp", "cents", 0.5)
    return med.select(
        "grp", (F.col("value").cast("double") / 100).alias("median_price")
    ).orderBy("grp")


# Pearson chi-square independence test (event_type x user cohort): the
# contingency table is one hash aggregation; marginals re-aggregate the
# (|types| x |cohorts|)-row cell table, so nothing corpus-sized is
# shuffled twice. Statistic and dof are exact integer-derived arithmetic
# until the final division, rounded to 6dp for cross-engine identity.
@query(
    "agg_chi2",
    sql="""
    WITH cells AS (
        SELECT event_type AS t, user_id % 4 AS c, COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ), rowm AS (
        SELECT t, SUM(o) AS rt FROM cells GROUP BY t
    ), colm AS (
        SELECT c, SUM(o) AS ct FROM cells GROUP BY c
    ), n AS (
        SELECT SUM(o) AS total FROM cells
    )
    SELECT ROUND(SUM(
               (o - CAST(rt AS DOUBLE) * ct / total)
               * (o - CAST(rt AS DOUBLE) * ct / total)
               / (CAST(rt AS DOUBLE) * ct / total)
           ), 6) AS chi2,
           CAST((COUNT(DISTINCT cells.t) - 1)
                * (COUNT(DISTINCT cells.c) - 1) AS BIGINT) AS dof
    FROM cells
    JOIN rowm USING (t) JOIN colm USING (c) CROSS JOIN n
    """,
)
def agg_chi2(spark, sf_dir):
    """Chi-square independence of event_type vs user_id%4 cohorts."""
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            F.col("event_type").alias("t"),
            (F.col("user_id") % 4).alias("c"),
        )
        .agg(F.count("*").alias("o"))
    )
    rowm = cells.groupBy("t").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("c").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("total"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("total")
    return (
        cells.join(F.broadcast(rowm), "t")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(n))
        .agg(
            F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
                "chi2"
            ),
            (
                (F.count_distinct(F.col("t")) - 1)
                * (F.count_distinct(F.col("c")) - 1)
            ).cast("bigint").alias("dof"),
        )
    )


# Welch two-sample t-test (unequal variances): urgent vs non-urgent order
# values. One grouped pass collects exact scaled-integer moments (the
# agg_regression discipline — order-independent sums, so the statistic is
# bit-stable across partitionings); the test statistic and the
# Welch-Satterthwaite dof are derived scalar arithmetic on the 2-row
# moment table. Completes the inferential-stats tier next to agg_chi2.
@query(
    "agg_ttest",
    sql="""
    WITH m AS (
        SELECT (o_orderpriority = '1-URGENT') AS grp,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS sx,
               -- squared sums blow the scaled-long budget past ~1M rows
               -- (exact.py overflow note): accumulate exactly in
               -- DECIMAL(38,0), convert once at the end
               CAST(SUM(CAST(round(o_totalprice * o_totalprice * 100)
                             AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sxx
        FROM orders GROUP BY 1
    ), s AS (
        SELECT MAX(CASE WHEN grp THEN n END) AS n1,
               MAX(CASE WHEN NOT grp THEN n END) AS n2,
               MAX(CASE WHEN grp THEN sx / n END) AS m1,
               MAX(CASE WHEN NOT grp THEN sx / n END) AS m2,
               MAX(CASE WHEN grp THEN (sxx - sx * sx / n) / (n - 1) END)
                   AS v1,
               MAX(CASE WHEN NOT grp THEN (sxx - sx * sx / n) / (n - 1) END)
                   AS v2
        FROM m
    )
    SELECT n1, n2,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POW(v1 / n1 + v2 / n2, 2)
                 / (POW(v1 / n1, 2) / (n1 - 1)
                    + POW(v2 / n2, 2) / (n2 - 1)), 2) AS welch_dof
    FROM s
    """,
)
def agg_ttest(spark, sf_dir):
    """Welch t-test of order value: urgent vs non-urgent priority."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.col("o_orderpriority") == "1-URGENT").alias("grp")
    ).agg(
        F.count("*").alias("n"),
        _ssum(F.col("o_totalprice"), 100).alias("sx"),
        (
            F.sum(
                F.round(
                    F.col("o_totalprice") * F.col("o_totalprice") * 100
                ).cast("decimal(38,0)")
            ).cast("double")
            / 100
        ).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    s = m.agg(
        F.max(F.when(F.col("grp"), F.col("n"))).alias("n1"),
        F.max(F.when(~F.col("grp"), F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp"), mean)).alias("m1"),
        F.max(F.when(~F.col("grp"), mean)).alias("m2"),
        F.max(F.when(F.col("grp"), var)).alias("v1"),
        F.max(F.when(~F.col("grp"), var)).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return s.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dof, 2).alias("welch_dof"),
    )


# Per-group quartiles in SHARED refinement passes (operators/quantile.py::
# grouped_quantiles): state is keyed by (group, q), so p25/p50/p75 for
# every returnflag resolve in the same 2-3 histogram aggregations a
# single median would take — three separate selections would triple the
# scans. The oracle is three windowed ROW_NUMBER selections UNIONed.
@query(
    "agg_group_quartiles",
    sql="""
    WITH v AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), r AS (
        SELECT grp, x,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM v
    )
    SELECT grp, CAST(q AS DOUBLE) AS q, CAST(x AS DOUBLE) / 100 AS value
    FROM (
        SELECT grp, 0.25 AS q, x, rn, CAST(CEIL(n * 0.25) AS BIGINT) AS k
        FROM r
        UNION ALL
        SELECT grp, 0.5, x, rn, CAST(CEIL(n * 0.5) AS BIGINT) FROM r
        UNION ALL
        SELECT grp, 0.75, x, rn, CAST(CEIL(n * 0.75) AS BIGINT) FROM r
    ) WHERE rn = k
    ORDER BY grp, q
    """,
)
def agg_group_quartiles(spark, sf_dir):
    """p25/p50/p75 lineitem price per returnflag, all in shared passes."""
    from corintick_spark.operators.quantile import grouped_quantiles

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    out = grouped_quantiles(li, "grp", "cents", [0.25, 0.5, 0.75])
    return out.select(
        "grp", "q", (F.col("value").cast("double") / 100).alias("value")
    ).orderBy("grp", "q")
