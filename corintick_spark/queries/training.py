"""Training-data curation wave: weighted sampling, corpus/stream
histograms, per-class embedding centroids, and k-NN label assignment.

These extend the LLM-pipeline tier (queries/llm.py) with the selection and
diagnostics steps a pretraining data pipeline runs between dedup and
packing. The reference kept raw series and left derivation client-side
(SURVEY.md §2.1 †); here every step is a declarative Spark plan with an
exact DuckDB oracle.

Determinism conventions (corintick_spark.exact): randomness comes from the
portable Knuth multiplicative hash (same integer expression in both
engines — the corpus_mixture convention); float outputs are either exact
scaled-long derivations or single IEEE expressions evaluated identically
by both engines; every ORDER BY carries a unique tiebreak.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.catalog import table
from corintick_spark.registry import query

# (doc_id * K) % 2^32 — Knuth multiplicative hash; uniform enough for
# sampling and bit-identical in Spark and DuckDB (pure int64 arithmetic).
_KNUTH = 2654435761
_M32 = 4294967296


def _knuth(col):
    return (col * F.lit(_KNUTH)) % F.lit(_M32)


# Priority sampling (Duffield-Lund-Thorup, "Priority sampling for
# estimation of arbitrary subset sums", JACM 2007): weight-proportional
# sample without replacement by taking the k largest priorities
# q_i = w_i / u_i with u_i uniform in (0,1). Unlike Efraimidis-Spirakis
# (u^(1/w)) the priority needs NO transcendental call — one IEEE division
# of exact integers, so both engines compute bit-identical priorities and
# the selected set is engine-independent. At 100 TB this is a single scan
# + TakeOrderedAndProject: per-partition heaps of k rows, no global sort,
# no shuffle of the full corpus.
@query(
    "sample_priority",
    sql=f"""
    SELECT doc_id, source, n_chars,
           CAST(n_chars AS DOUBLE) * {_M32}.0
               / (CAST((doc_id * {_KNUTH}) % {_M32} AS DOUBLE) + 0.5)
               AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)
def sample_priority(spark, sf_dir):
    """Weighted (by n_chars) priority sample of 100 docs — deterministic
    weighted selection without replacement, no transcendentals."""
    d = table(spark, sf_dir, "documents")
    pr = (F.col("n_chars").cast("double") * F.lit(float(_M32))) / (
        _knuth(F.col("doc_id")).cast("double") + F.lit(0.5)
    )
    return (
        d.select("doc_id", "source", "n_chars", pr.alias("priority"))
        .orderBy(F.desc("priority"), "doc_id")
        .limit(100)
    )


# Corpus length histogram: power-of-two-ish doc-length buckets per
# language — the standard "what does my corpus look like" diagnostic
# before length filtering. Bucketing is a CASE ladder (integer compares —
# no log2 call whose boundary ulp could differ between engines); the
# share is a FLOOR-quantized ratio of exact counts. One partial+final
# hash aggregate; the per-lang totals come from a window over the tiny
# aggregated result, not a second scan.
@query(
    "docs_length_histogram",
    sql="""
    WITH b AS (
        SELECT lang,
               CASE WHEN n_chars < 64 THEN '0-63'
                    WHEN n_chars < 128 THEN '64-127'
                    WHEN n_chars < 256 THEN '128-255'
                    WHEN n_chars < 512 THEN '256-511'
                    ELSE '512+' END AS bucket,
               COUNT(*) AS n
        FROM documents
        GROUP BY 1, 2
    )
    SELECT lang, bucket, n,
           FLOOR(CAST(n AS DOUBLE) * 1000000
                 / SUM(n) OVER (PARTITION BY lang)) / 1000000 AS share
    FROM b
    ORDER BY lang, bucket
    """,
)
def docs_length_histogram(spark, sf_dir):
    """Per-language doc-length histogram with in-language share."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 64, "0-63")
        .when(F.col("n_chars") < 128, "64-127")
        .when(F.col("n_chars") < 256, "128-255")
        .when(F.col("n_chars") < 512, "256-511")
        .otherwise("512+")
    )
    b = d.groupBy("lang", bucket.alias("bucket")).agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    share = F.floor(
        F.col("n").cast("double") * F.lit(1_000_000) / F.sum("n").over(w)
    ) / F.lit(1_000_000)
    return b.select("lang", "bucket", "n", share.alias("share")).orderBy(
        "lang", "bucket"
    )


# Fixed-width value histogram per event type. The bin index is the one
# shared expression FLOOR(value/25) clamped to [0,19] — deliberately NOT
# width_bucket(), whose internal rounding is implementation-defined and
# can disagree between engines for boundary doubles. NULL values form
# their own NULL bin (SQL grouping semantics in both engines).
@query(
    "events_value_histogram",
    sql="""
    SELECT event_type,
           CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19) AS INTEGER)
               AS bin,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS bin_min,
           CAST(MAX(value) AS DOUBLE) AS bin_max
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bin
    """,
)
def events_value_histogram(spark, sf_dir):
    """20-bin fixed-width histogram of event values per type."""
    ev = table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(25.0)), F.lit(0)), F.lit(19)
    ).cast("int")
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("bin_min"),
            F.max("value").cast("double").alias("bin_max"),
        )
        .orderBy("event_type", "bin")
    )


# Per-label embedding centroids, melted to (label, dim, centroid): the
# class-prototype computation behind centroid-based dedup/clustering
# seeding. posexplode keeps the dimension index JVM-side; the mean is an
# exact scaled-long sum over float→double-exact values divided by the
# group count. Scale shape: one shuffle keyed (label, dim) — 64·|labels|
# cells regardless of corpus size, with map-side partial aggregation
# doing the heavy reduction.
@query(
    "embedding_centroids",
    sql="""
    WITH m AS (
        SELECT label,
               CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT label, dim,
           CAST(SUM(CAST(round(val * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 / COUNT(*) AS centroid
    FROM m
    GROUP BY label, dim
    ORDER BY label, dim
    """,
)
def embedding_centroids(spark, sf_dir):
    """Exact per-label mean embedding, one row per (label, dimension)."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    centroid = (
        F.sum(F.round(F.col("val").cast("double") * 1_000_000).cast("bigint"))
        .cast("double")
        / 1_000_000
        / F.count("*")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(centroid.alias("centroid"))
        .orderBy("label", "dim")
    )


# k-NN classification: majority label among the 10 nearest corpus
# neighbours of each probe vector — the standard embedding-quality /
# label-propagation primitive. Reuses brute_force_topk (broadcast probes,
# one corpus pass, rounded-score ranking with c_id tiebreak — identical
# CTE structure in the oracle) and resolves vote ties toward the smaller
# label in both engines.
@query(
    "knn_classify",
    sql="""
    WITH q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id < 20
    ), c AS (
        SELECT vec_id AS c_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id >= 20
    ), pairs AS (
        SELECT q.q_id, c.c_id, c.label,
               ROUND(list_inner_product(q.e, c.e)
                     / (SQRT(list_inner_product(q.e, q.e))
                        * SQRT(list_inner_product(c.e, c.e))), 6) AS score
        FROM c, q
    ), ranked AS (
        SELECT q_id, c_id, label, score,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, c_id
               ) AS rnk
        FROM pairs
    ), votes AS (
        SELECT q_id, label, COUNT(*) AS n_votes
        FROM ranked WHERE rnk <= 10
        GROUP BY q_id, label
    )
    SELECT q_id, label AS pred_label, n_votes
    FROM (
        SELECT q_id, label, n_votes,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY n_votes DESC, label
               ) AS vr
        FROM votes
    ) v
    WHERE vr = 1
    ORDER BY q_id
    """,
)
def knn_classify(spark, sf_dir):
    """10-NN majority-label prediction for 20 probe vectors."""
    from corintick_spark.operators.similarity import brute_force_topk

    e = table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20)
    corpus = e.filter(F.col("vec_id") >= 20)
    top = brute_force_topk(probes, corpus, k=10, max_broadcast_rows=None)
    labeled = top.join(
        e.select(F.col("vec_id").alias("c_id"), "label"), "c_id"
    )
    votes = labeled.groupBy("q_id", "label").agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("q_id", F.col("label").alias("pred_label"), "n_votes")
        .orderBy("q_id")
    )


# Exact covariance matrix of the embedding corpus (upper triangle):
# Arrow-batched partial Gram folds (numpy matmul per batch — vectorized,
# never per-row Python) reduced through a (i, j)-keyed hash aggregate —
# d² cells of shuffle however large the corpus. The oracle computes the
# identical integers via a per-vector dim×dim self-join. See
# operators/linalg.py for the exactness argument.
@query(
    "embedding_covariance",
    sql="""
    WITH m AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
                    AS BIGINT) AS q
        FROM embeddings
        WHERE embedding IS NOT NULL
    ), pairs AS (
        SELECT a.dim AS i, b.dim AS j, SUM(a.q * b.q) AS g, COUNT(*) AS n
        FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    ), marg AS (
        SELECT dim, SUM(q) AS s, COUNT(*) AS cnt FROM m GROUP BY dim
    )
    SELECT p.i, p.j,
           CAST(p.g AS DOUBLE) / 1000000.0 / p.n
           - (CAST(ma.s AS DOUBLE) / 1000.0 / ma.cnt)
             * (CAST(mb.s AS DOUBLE) / 1000.0 / mb.cnt) AS cov
    FROM pairs p
    JOIN marg ma ON ma.dim = p.i
    JOIN marg mb ON mb.dim = p.j
    ORDER BY p.i, p.j
    """,
)
def embedding_covariance(spark, sf_dir):
    """Exact 64×64 embedding covariance via distributed scaled-long Gram
    partials (operators/linalg.py)."""
    from corintick_spark.operators.linalg import covariance

    e = table(spark, sf_dir, "embeddings")
    return covariance(e)


# PCA top-component projection: the d×d covariance (data-size-independent)
# solves driver-side by power iteration; the dominant eigenvector
# broadcasts back as a literal and the projection is a JVM zip_with fold.
# Eigenvector values are iteration-path-specific → rows-only; the numpy
# differential (tests/test_linalg.py) pins projections against
# np.linalg.eigh to 1e-6.
@query("embedding_pca", sql=None)
def embedding_pca(spark, sf_dir):
    """Per-vector projection onto the corpus's top principal component.
    Rows-only invariant (Rayleigh dominance): Var(projection) = v'Cv = λ1
    must be >= the variance of EVERY single coordinate axis (e_j'Ce_j) —
    computed here from the raw data, independently of the eigen solve. A
    wrong eigenvector fails this whenever any axis beats it."""
    from corintick_spark.operators.linalg import pca_top_component

    e = table(spark, sf_dir, "embeddings")
    out = pca_top_component(e)
    axis_var = (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.var_pop(F.col("x").cast("double")).alias("v"))
        .agg(F.max("v").alias("inv_max_axis_var"))
    )
    proj_var = out.agg(
        F.var_pop("pc1_projection").alias("inv_proj_var")
    )
    return (
        out.crossJoin(F.broadcast(proj_var))  # 1-row aggregates
        .crossJoin(F.broadcast(axis_var))
        .withColumn(
            "inv_ok",
            # 1e-3 headroom covers the quantized-covariance eigen basis
            # vs the raw-float variance computed here
            F.col("inv_proj_var")
            >= F.col("inv_max_axis_var") * F.lit(0.999),
        )
    )


# Lagged cross-correlation between two event streams: do 'view' spikes
# lead 'purchase' spikes? Hourly counts on a DENSE hour grid (missing
# hours are real zeros — an inner join on observed hours only would bias
# every moment), then Pearson r at lags −3h..+3h from exact integer
# moments: n·Sxy − Sx·Sy over integer counts is exact, the one final
# sqrt/division is the same IEEE expression in both engines, FLOOR-
# quantized. Scale shape: the grid is |hours| rows (bounded by calendar
# time, not event count), so the lag join is a tiny-table self-join after
# one partial+final count aggregation over the events scan.
@query(
    "events_cross_corr",
    sql="""
    WITH h AS (
        SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour,
               event_type, COUNT(*) AS cnt
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY 1, 2
    ), bounds AS (
        SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM h
    ), grid AS (
        SELECT unnest(generate_series(h0, h1)) AS hour FROM bounds
    ), x AS (
        SELECT g.hour, COALESCE(h.cnt, 0) AS v
        FROM grid g LEFT JOIN h ON h.hour = g.hour AND h.event_type = 'view'
    ), y AS (
        SELECT g.hour, COALESCE(h.cnt, 0) AS v
        FROM grid g LEFT JOIN h ON h.hour = g.hour AND h.event_type = 'purchase'
    ), lags AS (
        SELECT unnest(generate_series(-3, 3)) AS lag
    ), mo AS (
        SELECT l.lag, COUNT(*) AS n,
               SUM(x.v) AS sx, SUM(y.v) AS sy,
               SUM(x.v * x.v) AS sxx, SUM(y.v * y.v) AS syy,
               SUM(x.v * y.v) AS sxy
        FROM lags l
        JOIN x ON TRUE
        JOIN y ON y.hour = x.hour + l.lag
        GROUP BY l.lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, n AS n_hours,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
                 * 1000000) / 1000000 AS corr
    FROM mo
    ORDER BY lag
    """,
)
def events_cross_corr(spark, sf_dir):
    """Pearson cross-correlation of hourly view vs purchase counts at lags
    −3h..+3h, on a dense hour grid with exact integer moments."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    h = (
        ev.select(
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000.0))
            .cast("bigint")
            .alias("hour"),
            "event_type",
        )
        .groupBy("hour", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    bounds = h.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    def series(etype):
        side = h.filter(F.col("event_type") == etype).select(
            "hour", F.col("cnt").alias("v")
        )
        return grid.join(side, "hour", "left").select(
            "hour", F.coalesce("v", F.lit(0)).alias("v")
        )

    x = series("view")
    y = series("purchase").select(
        F.col("hour").alias("y_hour"), F.col("v").alias("yv")
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    mo = (
        F.broadcast(lags)
        .join(x)
        .join(y, F.col("y_hour") == F.col("hour") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sx"),
            F.sum("yv").alias("sy"),
            F.sum(F.col("v") * F.col("v")).alias("sxx"),
            F.sum(F.col("yv") * F.col("yv")).alias("syy"),
            F.sum(F.col("v") * F.col("yv")).alias("sxy"),
        )
    )
    corr = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.nullif(
            F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            F.lit(0.0),
        )
        * F.lit(1_000_000)
    ) / F.lit(1_000_000)
    return mo.select(
        "lag", F.col("n").alias("n_hours"), corr.alias("corr")
    ).orderBy("lag")


# Per-user feature extraction — the "feature store" step that turns an
# event log into an ML feature vector: per-type counts (static pivot —
# the type vocabulary is known, so no dynamic two-pass pivot), exact
# monetary totals, activity span in distinct days, recency. One
# partial+final hash aggregate over the events scan; every feature is
# integer-exact (day indexes via the portable FLOOR division, totals via
# scaled longs).
@query(
    "features_per_user",
    sql="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value,
           COUNT(DISTINCT CAST(FLOOR(epoch_us(ts) / 86400000000.0)
                               AS BIGINT)) AS n_days_active,
           MAX(CAST(epoch_us(ts) AS BIGINT)) AS last_seen_us
    FROM events
    GROUP BY user_id
    """,
)
def features_per_user(spark, sf_dir):
    """Event-log → per-user ML feature vector (type counts, exact spend,
    active days, recency)."""
    ev = table(spark, sf_dir, "events")

    def cnt(t):
        return F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("bigint").alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        cnt("view"), cnt("click"), cnt("purchase"), cnt("error"),
        cnt("signup"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            .cast("double") / 1_000_000
        ).alias("total_value"),
        F.countDistinct(
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast(
                "bigint"
            )
        ).alias("n_days_active"),
        F.max(F.unix_micros("ts").cast("bigint")).alias("last_seen_us"),
    )


# Stratified deterministic train/test split: the hash threshold keys on
# vec_id (Knuth — the corpus_mixture convention) so membership is stable
# across runs and engines; stratification is verified by reporting the
# per-label split shares. At 100 TB the split column is a pure map-side
# expression — no shuffle beyond the audit aggregate itself.
@query(
    "ml_split_stratified",
    sql=f"""
    WITH s AS (
        SELECT label,
               CASE WHEN ((vec_id * {_KNUTH}) % {_M32}) / {_M32}.0 < 0.8
                    THEN 'train' ELSE 'test' END AS split
        FROM embeddings
    )
    SELECT label, split, COUNT(*) AS n,
           FLOOR(CAST(COUNT(*) AS DOUBLE) * 1000000
                 / SUM(COUNT(*)) OVER (PARTITION BY label)) / 1000000
               AS share
    FROM s
    GROUP BY label, split
    ORDER BY label, split
    """,
)
def ml_split_stratified(spark, sf_dir):
    """Deterministic 80/20 train-test split with per-label share audit."""
    e = table(spark, sf_dir, "embeddings")
    split = F.when(
        _knuth(F.col("vec_id")) / F.lit(float(_M32)) < 0.8, "train"
    ).otherwise("test")
    s = e.select("label", split.alias("split"))
    g = s.groupBy("label", "split").agg(F.count("*").alias("n"))
    w = Window.partitionBy("label")
    share = F.floor(
        F.col("n").cast("double") * F.lit(1_000_000) / F.sum("n").over(w)
    ) / F.lit(1_000_000)
    return g.select("label", "split", "n", share.alias("share")).orderBy(
        "label", "split"
    )


# Frequent co-occurring event-type pairs (market-basket support over
# user-day baskets) — the exact small-vocabulary case of frequent-itemset
# mining: with a bounded type vocabulary the pair lattice is tiny, so the
# A-priori machinery collapses to one DISTINCT + one self-join on the
# basket key + one count — all declarative, no iterative candidate
# generation. Scale shape: the DISTINCT prunes each basket to ≤|vocab|
# rows before the join, and the join key (user, day) is the basket id —
# never a cross join over raw events.
@query(
    "events_frequent_pairs",
    sql="""
    WITH b AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
               event_type
        FROM events
    ), p AS (
        SELECT a.event_type AS ta, c.event_type AS tb
        FROM b a
        JOIN b c ON a.user_id = c.user_id AND a.day = c.day
                AND a.event_type < c.event_type
    )
    SELECT ta, tb, COUNT(*) AS support
    FROM p
    GROUP BY ta, tb
    ORDER BY support DESC, ta, tb
    """,
)
def events_frequent_pairs(spark, sf_dir):
    """Support counts for event-type pairs co-occurring within a user-day
    basket."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0))
        .cast("bigint")
        .alias("day"),
        "event_type",
    ).distinct()
    a = b.alias("a")
    c = b.alias("c")
    p = a.join(
        c,
        (F.col("a.user_id") == F.col("c.user_id"))
        & (F.col("a.day") == F.col("c.day"))
        & (F.col("a.event_type") < F.col("c.event_type")),
    ).select(
        F.col("a.event_type").alias("ta"), F.col("c.event_type").alias("tb")
    )
    return (
        p.groupBy("ta", "tb")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "ta", "tb")
    )


# Token-pair pointwise mutual information across the corpus — the
# collocation/association primitive behind phrase mining and embedding
# evaluation. Document-level co-occurrence: c_xy = docs containing both
# (support-filtered), PMI = log2(c_xy·D / (c_x·c_y)). Float discipline:
# each log2 term is quantized independently (round(log2(int)·1e6) — the
# text_perplexity technique) and PMI is an INTEGER combination of the
# four quantized terms, so both engines agree bit-for-bit. Scale shape:
# the co-occurrence self-join runs over the TOP-100 vocabulary only
# (derived in-plan via TakeOrdered), so the per-doc pair lattice is
# ≤ C(100,2) however long the document — the edge sweep's adversarial
# long doc made the uncapped version quadratic in doc length; the
# support HAVING then prunes before the dimension joins.
@query(
    "text_pmi_pairs",
    sql="""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS w
        FROM documents
    ), dt AS (
        SELECT DISTINCT doc_id, w FROM tok
    ), cx AS (
        SELECT w, COUNT(*) AS c FROM dt GROUP BY w
    ), top AS (
        SELECT w, c FROM cx ORDER BY c DESC, w LIMIT 100
    ), dtt AS (
        SELECT dt.doc_id, dt.w FROM dt JOIN top ON top.w = dt.w
    ), dd AS (
        SELECT COUNT(*) AS d FROM documents
    ), pairs AS (
        SELECT a.w AS x, c.w AS y, COUNT(*) AS cxy
        FROM dtt a JOIN dtt c ON a.doc_id = c.doc_id AND a.w < c.w
        GROUP BY a.w, c.w
        HAVING COUNT(*) >= 5
    )
    SELECT p.x, p.y, p.cxy,
           CAST(CAST(round(log2(p.cxy) * 1000000) AS BIGINT)
                + CAST(round(log2(dd.d) * 1000000) AS BIGINT)
                - CAST(round(log2(ca.c) * 1000000) AS BIGINT)
                - CAST(round(log2(cb.c) * 1000000) AS BIGINT) AS DOUBLE)
               / 1000000 AS pmi
    FROM pairs p
    JOIN top ca ON ca.w = p.x
    JOIN top cb ON cb.w = p.y
    CROSS JOIN dd
    ORDER BY pmi DESC, p.x, p.y
    LIMIT 50
    """,
)
def text_pmi_pairs(spark, sf_dir):
    """Top-50 document-level PMI token pairs (support ≥ 5)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), t -> t != '')")).alias("w"),
    )
    dt = tok.distinct()
    cx = dt.groupBy("w").agg(F.count("*").alias("c"))
    # bound the pair lattice: only the top-100 vocabulary participates —
    # an adversarial long doc (edge sweep!) otherwise makes the per-doc
    # self-join quadratic in DOC LENGTH; with the cap it is ≤ C(100,2)
    # per doc however long the doc. TakeOrdered, not a global sort.
    top = cx.orderBy(F.desc("c"), "w").limit(100)
    dtt = dt.join(F.broadcast(top.select("w")), "w")
    dd = d.agg(F.count("*").alias("d"))
    a = dtt.alias("a")
    c = dtt.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.doc_id") == F.col("c.doc_id"))
            & (F.col("a.w") < F.col("c.w")),
        )
        .groupBy(F.col("a.w").alias("x"), F.col("c.w").alias("y"))
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= 5)
    )

    def r(col):
        return F.round(F.log2(col) * 1_000_000).cast("bigint")

    pmi = (
        r(F.col("cxy")) + r(F.col("d")) - r(F.col("ca.c")) - r(F.col("cb.c"))
    ).cast("double") / F.lit(1_000_000)
    return (
        pairs.join(F.broadcast(top.alias("ca")), F.col("ca.w") == F.col("x"))
        .join(F.broadcast(top.alias("cb")), F.col("cb.w") == F.col("y"))
        .crossJoin(F.broadcast(dd))
        .select("x", "y", "cxy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "x", "y")
        .limit(50)
    )
