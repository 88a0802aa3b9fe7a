"""Event-log pipeline operators: CDC upsert compaction, SCD2 interval
builds, Markov transitions, time-in-state accounting, serial correlation.

corintick stored raw tick/event frames and left this derivation to
client-side pandas (SURVEY.md §2.1 verdict †); these queries run the same
derivations in-engine. All five share one physical shape: a single shuffle
on ``user_id`` (the window partition key), then narrow window/aggregate
stages — the plan a 100 TB event log wants, since the key is the natural
partitioning of the data and every stage after the exchange is
whole-stage-codegen. No driver-side actions, no Python in the hot path.

Determinism contract: every window orders by ``(ts, event_id)`` — unique
per user — so LAG/LEAD/ROW_NUMBER agree bit-for-bit with the DuckDB
oracles; interval arithmetic is integer microseconds (``unix_micros``),
never float.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.catalog import table
from corintick_spark.registry import query


# CDC upsert compaction ("MERGE INTO" read-side equivalent): treat the
# event log as a change stream keyed by user_id and materialize the
# latest state per key. One shuffle; AQE coalesces the post-window
# filter. At 100 TB this is the standard log→snapshot compaction job.
@query(
    "cdc_merge",
    sql="""
    WITH ranked AS (
        SELECT user_id, ts, event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           ts AS last_ts,
           event_type AS last_type,
           CAST(value AS DOUBLE) AS last_value,
           event_id AS last_event_id
    FROM ranked WHERE rn = 1
    """,
)
def cdc_merge(spark, sf_dir):
    """Latest-state-per-key upsert compaction over the event log."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").cast("double").alias("last_value"),
            F.col("event_id").alias("last_event_id"),
        )
    )


# SCD Type-2 dimension build: collapse consecutive same-type runs into
# validity intervals [valid_from, valid_to). Two window passes over the
# same (user_id, ts, event_id) sort — Spark reuses the exchange+sort, so
# physically it is still one shuffle.
@query(
    "scd2_intervals",
    sql="""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), chg AS (
        SELECT user_id, event_id, event_type, ts AS valid_from
        FROM o WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           (LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from, event_id) IS NULL)
               AS is_current
    FROM chg
    """,
)
def scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension (type 2) intervals from type-change rows."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_id", "event_type", F.col("ts").alias("valid_from"))
    )
    wc = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(wc)
    return chg.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# Markov transition matrix of event types: bigram counts via LAG, plus the
# per-source transition probability (row-level double division — identical
# on identical inputs in both engines).
@query(
    "event_transitions",
    sql="""
    WITH o AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), c AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n_transitions,
           ROUND(n_transitions / SUM(n_transitions)
                 OVER (PARTITION BY prev_type), 6) AS p_transition
    FROM c
    """,
)
def event_transitions(spark, sf_dir):
    """First-order Markov transition counts/probabilities of event types."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("p_transition"),
    )


# Time-in-state: each event opens a state that lasts until the user's next
# event; total/average dwell per state in exact integer microseconds.
@query(
    "event_durations",
    sql="""
    WITH o AS (
        SELECT event_type,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_us
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_spans,
           CAST(SUM(next_us - us) AS BIGINT) AS total_us,
           ROUND(CAST(SUM(next_us - us) AS BIGINT) / COUNT(*) / 1000000.0, 6)
               AS avg_dwell_s
    FROM o WHERE next_us IS NOT NULL
    GROUP BY event_type
    """,
)
def event_durations(spark, sf_dir):
    """Total/average time spent in each event-type state per user stream."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    spans = (
        ev.select("user_id", "ts", "event_id", "event_type", us.alias("us"))
        .withColumn("next_us", F.lead("us").over(wo))
        .filter(F.col("next_us").isNotNull())
    )
    dur = F.col("next_us") - F.col("us")
    return spans.groupBy("event_type").agg(
        F.count("*").alias("n_spans"),
        F.sum(dur).alias("total_us"),
        F.round(
            F.sum(dur).cast("double") / F.count("*") / 1_000_000.0, 6
        ).alias("avg_dwell_s"),
    )


# Lag-1 serial correlation of `value` per user — exact scaled moments (the
# agg_corr technique: F.corr's float accumulation order would diverge from
# any oracle). Pairs come from one LAG pass; moments from one hash agg.
@query(
    "event_autocorr",
    sql="""
    WITH p AS (
        SELECT user_id, value AS v,
               LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pv
        FROM events
    ), m AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS sv,
               CAST(SUM(CAST(round(pv * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS sp,
               CAST(SUM(CAST(round(v * v * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS svv,
               CAST(SUM(CAST(round(pv * pv * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS spp,
               CAST(SUM(CAST(round(v * pv * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS svp
        FROM p WHERE pv IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((n * svp - sv * sp)
                 / NULLIF(SQRT(GREATEST(n * svv - sv * sv, 0))
                          * SQRT(GREATEST(n * spp - sp * sp, 0)), 0)
               , 6) AS autocorr_lag1
    FROM m
    """,
)
def event_autocorr(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values (exact moments)."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.select("user_id", "ts", "event_id", F.col("value").alias("v"))
        .withColumn("pv", F.lag("v").over(wo))
        .filter(F.col("pv").isNotNull())
    )

    def ssum(e, scale):
        return F.sum(F.round(e * scale).cast("bigint")).cast("double") / scale

    m = p.groupBy("user_id").agg(
        F.count("*").alias("n"),
        ssum(F.col("v"), 1_000_000).alias("sv"),
        ssum(F.col("pv"), 1_000_000).alias("sp"),
        ssum(F.col("v") * F.col("v"), 1_000).alias("svv"),
        ssum(F.col("pv") * F.col("pv"), 1_000).alias("spp"),
        ssum(F.col("v") * F.col("pv"), 1_000).alias("svp"),
    )
    n = F.col("n")
    # Constant series make a discriminant exactly 0 (NULL autocorr, not an
    # ANSI DIVIDE_BY_ZERO abort), and the mixed 1e6/1e3 scaling can push it
    # epsilon-negative (clamp, or Spark yields NaN where DuckDB errors).
    dvv = F.greatest(n * F.col("svv") - F.col("sv") * F.col("sv"), F.lit(0.0))
    dpp = F.greatest(n * F.col("spp") - F.col("sp") * F.col("sp"), F.lit(0.0))
    ac = (n * F.col("svp") - F.col("sv") * F.col("sp")) / F.nullif(
        F.sqrt(dvv) * F.sqrt(dpp), F.lit(0.0)
    )
    return m.select("user_id", "n", F.round(ac, 6).alias("autocorr_lag1"))


# Last-touch attribution: each purchase credits the user's most recent
# preceding view/click. One window with an IGNORE NULLS last() over the
# preceding frame — no self-join, no per-purchase probe.
@query(
    "events_attribution",
    sql="""
    WITH w AS (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch_ts
        FROM events
    )
    SELECT event_id, user_id, ts AS purchase_ts, touch_ts,
           (touch_ts IS NOT NULL) AS attributed,
           CAST(CASE WHEN touch_ts IS NOT NULL
                     THEN epoch_us(ts) - epoch_us(touch_ts) END AS BIGINT)
               AS delay_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def events_attribution(spark, sf_dir):
    """Attribute each purchase to the latest preceding view/click touch."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("view", "click"), F.col("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch_ts", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "touch_ts",
            F.col("touch_ts").isNotNull().alias("attributed"),
            F.when(
                F.col("touch_ts").isNotNull(),
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts")),
            )
            .cast("bigint")
            .alias("delay_us"),
        )
    )


# Greedy rate-limit / throttle — keep an event only if >= 30 min have
# passed since the last KEPT event of the same user. This is a sequential
# left-fold per key (each decision depends on the previous KEPT row, not
# the previous row), so no window function expresses it; the Spark side
# folds the per-user ordered event list with aggregate() entirely JVM-side
# (same engine-parity technique as window_ewma's aggregate==list_reduce),
# the oracle walks the identical chain with a recursive CTE. Per-key state
# is the user's event list — bounded by per-user cardinality; an unbounded
# key would use the streaming stateful processor instead (stream_stateful).
@query(
    "events_throttle",
    sql="""
    WITH RECURSIVE ev AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), keep(user_id, rn, tus, event_id) AS (
        SELECT user_id, rn, tus, event_id FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn, e.tus, e.event_id
        FROM keep k JOIN ev e
          ON e.user_id = k.user_id
         AND e.rn = (SELECT MIN(e2.rn) FROM ev e2
                     WHERE e2.user_id = k.user_id AND e2.rn > k.rn
                       AND e2.tus - k.tus >= 1800000000)
    )
    SELECT user_id, event_id FROM keep
    """,
)
def events_throttle(spark, sf_dir):
    """Events surviving a per-user 30-minute greedy throttle (first event
    kept, then each event >= 30 min after the last kept one)."""
    ev = table(spark, sf_dir, "events")
    lst = F.array_sort(
        F.collect_list(
            F.struct(F.unix_micros("ts").alias("tus"), F.col("event_id"))
        )
    )
    kept = F.expr(
        "aggregate(lst,"
        " named_struct('last', CAST(NULL AS BIGINT),"
        "              'ids', CAST(array() AS ARRAY<BIGINT>)),"
        " (acc, e) -> IF(acc.last IS NULL OR e.tus - acc.last >= 1800000000,"
        "   named_struct('last', e.tus,"
        "                'ids', array_append(acc.ids, e.event_id)),"
        "   acc),"
        " acc -> acc.ids)"
    )
    return (
        ev.groupBy("user_id")
        .agg(lst.alias("lst"))
        .select("user_id", F.explode(kept).alias("event_id"))
    )


# Point-in-interval temporal join through the range-bucketed rewrite
# (operators/interval.py) — the first ORACLE-adjudicated exercise of that
# operator (previously unit/plan-tested only). Global maintenance windows
# (every 7th hourly slot of the observed span, derived in-plan from the
# events min/max) have NO equi key against events, so a naive overlap join
# is a nested-loop — the rewrite makes it an equi-join on the hour bucket
# with an exact residual filter. Windows are disjoint, so each event
# matches at most once and the oracle is a plain BETWEEN join.
@query(
    "join_interval_point",
    sql="""
    WITH bounds AS (
        SELECT CAST(FLOOR(epoch_us(MIN(ts)) / 3600000000.0) AS BIGINT) AS s0,
               CAST(FLOOR(epoch_us(MAX(ts)) / 3600000000.0) AS BIGINT) AS s1
        FROM events
    ), slots AS (
        SELECT make_timestamp(s * 3600000000) AS w_start,
               make_timestamp(s * 3600000000 + 3599999999) AS w_end
        FROM bounds, UNNEST(range(s0, s1 + 1)) t(s)
        WHERE s % 7 = 0
    )
    SELECT e.event_id, e.user_id, e.ts, s.w_start
    FROM events e JOIN slots s ON e.ts BETWEEN s.w_start AND s.w_end
    """,
)
def join_interval_point(spark, sf_dir):
    """Events falling inside any maintenance window (every 7th hourly slot),
    joined via the range-bucketed interval join."""
    from corintick_spark.operators.interval import interval_overlap_join

    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.floor(F.unix_micros(F.min("ts")) / 3_600_000_000).cast("bigint").alias("s0"),
        F.floor(F.unix_micros(F.max("ts")) / 3_600_000_000).cast("bigint").alias("s1"),
    )
    slots = (
        b.select(F.explode(F.sequence("s0", "s1")).alias("s"))
        .filter(F.col("s") % 7 == 0)
        .select(
            F.timestamp_micros(F.col("s") * 3_600_000_000).alias("w_start"),
            F.timestamp_micros(F.col("s") * 3_600_000_000 + 3_599_999_999).alias(
                "w_end"
            ),
        )
    )
    pts = ev.select(
        "event_id", "user_id", "ts", F.col("ts").alias("_ts2")
    )
    joined = interval_overlap_join(
        pts, slots, "ts", "_ts2", "w_start", "w_end", bucket_width_s=3600
    )
    return joined.select("event_id", "user_id", "ts", "w_start")


# Time-to-convert distribution — funnel_conversion's temporal complement:
# how long from a user's first view to their first subsequent purchase.
# Per-user anchors are two tiny aggregates; durations are integer
# microseconds; percentiles are exact interpolated (agg_percentile
# rationale: oracle-checkable; at 100 TB swap in approx_percentile).
@query(
    "events_funnel_time",
    sql="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
        SELECT e.user_id,
               MIN(epoch_us(e.ts) - epoch_us(v.t0)) AS dur_us
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= v.t0
        GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(dur_us, 0.5), 4) AS p50_us,
           ROUND(quantile_cont(dur_us, 0.9), 4) AS p90_us,
           CAST(MAX(dur_us) AS BIGINT) AS max_us
    FROM p
    """,
)
def events_funnel_time(spark, sf_dir):
    """First-view -> first-purchase latency: converted-user count and exact
    p50/p90/max in integer microseconds."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts") - F.unix_micros("t0")).alias("dur_us")
        )
    )
    return p.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(dur_us, 0.5)"), 4).alias("p50_us"),
        F.round(F.expr("percentile(dur_us, 0.9)"), 4).alias("p90_us"),
        F.max("dur_us").cast("bigint").alias("max_us"),
    )


# Local-extrema detection — the signal-processing primitive (alert on
# spikes): an event is a peak iff its value strictly exceeds both
# neighbors in the user's (ts, event_id) sequence. Pure lag/lead on the
# one per-user exchange every event operator here shares; NULL-valued
# events are excluded up front (a NULL neighbor cannot certify a peak).
@query(
    "events_peaks",
    sql="""
    WITH s AS (
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER w AS prev_v,
               LEAD(value) OVER w AS next_v
        FROM events WHERE value IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts, value
    FROM s
    WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
      AND value > prev_v AND value > next_v
    """,
)
def events_peaks(spark, sf_dir):
    """Strict local maxima of each user's value sequence."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_id", "user_id", "ts", "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
    )
    return s.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("value") > F.col("prev_v"))
        & (F.col("value") > F.col("next_v"))
    ).select("event_id", "user_id", "ts", "value")


# Hour-of-day seasonality profile — the diurnal-pattern aggregate behind
# capacity planning and anomaly baselines: per (event_type, hour-of-day),
# event count and exact mean value. One partial-aggregated shuffle on a
# 24x|types| key space.
@query(
    "events_seasonality",
    sql="""
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000 / NULLIF(COUNT(value), 0), 6) AS mean_value
    FROM events
    GROUP BY event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT)
    """,
)
def events_seasonality(spark, sf_dir):
    """Diurnal profile: count + exact mean value per (type, hour-of-day)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hod")
    ).agg(
        F.count("*").alias("n"),
        F.round(
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast(
                    "double"
                )
                / 1_000_000
            )
            / F.nullif(F.count("value"), F.lit(0)),
            6,
        ).alias("mean_value"),
    )


# Inter-arrival process statistics — the arrival-rate profile behind
# capacity planning and burst detection: per event type, the exact
# median/p90/max of per-user successive gaps in integer microseconds.
# One per-user LAG pass on the shared exchange, then a small per-type
# aggregation over the gap column.
@query(
    "events_interarrival",
    sql="""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT event_type, COUNT(gap_us) AS n_gaps,
           ROUND(quantile_cont(gap_us, 0.5), 4) AS p50_us,
           ROUND(quantile_cont(gap_us, 0.9), 4) AS p90_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival(spark, sf_dir):
    """Per-type inter-arrival gap distribution (exact percentiles, µs)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5)"), 4).alias("p50_us"),
        F.round(F.expr("percentile(gap_us, 0.9)"), 4).alias("p90_us"),
        F.max("gap_us").cast("bigint").alias("max_us"),
    )


# Cart abandonment: views with NO purchase by the same user within the
# following hour — the time-bounded anti-join (NOT EXISTS with a range
# predicate). A plain (user_id)-keyed semi join with the window as a
# residual is CORRECT but quadratic in per-user event density (each view
# probes ALL of that user's purchases — measured unacceptably slow at
# sf1's 10×-denser timeline). The 100 TB shape adds the hour bucket to
# the join key (the interval.py rewrite): a 1-hour window spans at most
# two hour buckets, so each view meets only the purchases of its own two
# buckets and the residual check is O(purchases-per-user-hour).
@query(
    "events_abandonment",
    sql="""
    SELECT v.user_id,
           COUNT(*) AS n_views,
           CAST(SUM(CASE WHEN NOT EXISTS (
                    SELECT 1 FROM events p
                    WHERE p.event_type = 'purchase'
                      AND p.user_id = v.user_id
                      AND p.ts >= v.ts
                      AND p.ts <= v.ts + INTERVAL 1 HOUR
                ) THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
    FROM events v
    WHERE v.event_type = 'view'
    GROUP BY v.user_id
    """,
)
def events_abandonment(spark, sf_dir):
    """Per-user view count and views not followed by a purchase within
    one hour."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    hour_us = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_micros("ts") / F.lit(float(hour_us)))
        .cast("bigint")
        .alias("p_bucket"),
    )
    # each view's 1h window intersects exactly its own and the next bucket
    cand = views.select(
        "user_id",
        "event_id",
        "ts",
        F.explode(
            F.array(
                F.floor(F.unix_micros("ts") / F.lit(float(hour_us))).cast(
                    "bigint"
                ),
                F.floor(F.unix_micros("ts") / F.lit(float(hour_us))).cast(
                    "bigint"
                )
                + 1,
            )
        ).alias("bucket"),
    )
    followed = (
        cand.join(
            purchases,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("bucket") == F.col("p_bucket"))
            & (F.col("p_ts") >= F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
        .select("user_id", "event_id")
        .distinct()
    )
    flagged = views.join(
        followed.withColumn("followed", F.lit(1)),
        ["user_id", "event_id"],
        "left",
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_views"),
        F.sum(
            F.when(F.col("followed").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_abandoned"),
    )


# Sequence mining: the most frequent 3-step event-type paths, where a
# path is three consecutive events of one user within one day. LEAD
# windows build the trigram in one pass over the per-user sort — no
# self-joins on position; the count is a partial+final aggregate over
# short strings; top-20 is TakeOrdered. Day boundaries (portable FLOOR
# division) keep the window frames bounded for infinite logs.
@query(
    "events_top_paths",
    sql="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
               event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id,
                     CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT)
                     ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           COUNT(*) AS n
    FROM seq
    WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-20 three-step event-type paths within user-days."""
    ev = table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast("bigint")
    w = Window.partitionBy("user_id", day.alias("day")).orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    path = F.concat_ws(">", "event_type", "t2", "t3")
    return (
        seq.groupBy(path.alias("path"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


# Sweep-line concurrency: how many user sessions are open at every change
# point — the classic interval-stabbing aggregate (max concurrent users,
# capacity planning). The naive formulation is a GLOBAL cumulative sum =
# one SinglePartition window over every boundary; this implementation is
# the DISTRIBUTED PREFIX SUM: per-instant deltas aggregate map-side, hour
# buckets carry partial sums, the global prefix runs over the tiny bucket
# table only (|hours| rows), and each bucket's interior cumsum is a
# window partitioned BY BUCKET — no corpus-sized single partition
# anywhere. All-integer microsecond arithmetic; the DuckDB oracle is the
# textbook global-window form, so agreement proves the two-level
# decomposition exact.
@query(
    "events_concurrency",
    sql="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ), flags AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN lag(ts_us) OVER w IS NULL
                      OR ts_us - lag(ts_us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), sess AS (
        SELECT user_id, ts_us,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flags
    ), iv AS (
        SELECT user_id, session_id, MIN(ts_us) AS s, MAX(ts_us) AS e
        FROM sess GROUP BY user_id, session_id
    ), d AS (
        SELECT s AS t_us, 1 AS d FROM iv
        UNION ALL
        SELECT e + 1 AS t_us, -1 AS d FROM iv
    ), agg AS (
        SELECT t_us, CAST(SUM(d) AS BIGINT) AS d FROM d GROUP BY t_us
    )
    SELECT t_us,
           CAST(SUM(d) OVER (ORDER BY t_us ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS concurrency
    FROM agg
    """,
)
def events_concurrency(spark, sf_dir):
    """Concurrent open sessions at every boundary instant via a two-level
    distributed prefix sum (hour buckets; no global single partition)."""
    from pyspark.sql import Window
    from corintick_spark.operators import sessions as SS

    e = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    iv = SS.session_stats(
        SS.sessionize(e, key="user_id", ts_us="ts_us"),
        key="user_id",
        ts_us="ts_us",
    ).select("first_us", "last_us")
    deltas = (
        iv.select(F.col("first_us").alias("t_us"), F.lit(1).alias("d"))
        .unionByName(
            iv.select((F.col("last_us") + 1).alias("t_us"), F.lit(-1).alias("d"))
        )
        .groupBy("t_us")
        .agg(F.sum("d").cast("bigint").alias("d"))
        .withColumn("_bucket", F.col("t_us") - F.pmod("t_us", F.lit(3_600_000_000)))
    )
    per_bucket = deltas.groupBy("_bucket").agg(F.sum("d").alias("_bd"))
    wb = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bucket",
        F.coalesce(F.sum("_bd").over(wb), F.lit(0)).alias("_off"),
    )
    wi = (
        Window.partitionBy("_bucket")
        .orderBy("t_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        deltas.join(F.broadcast(offsets), "_bucket")
        .select(
            "t_us",
            (F.col("_off") + F.sum("d").over(wi)).cast("bigint").alias("concurrency"),
        )
    )


# Sequence-pattern detection (MATCH_RECOGNIZE's core): count occurrences
# of "one-or-more views, then a click, then a purchase" inside each
# user-day's time-ordered event string. The distributed shape: one
# hash-aggregation builds each group's letter sequence (array_sort over
# (ts, event_id) makes the order deterministic and shuffle-immune; group
# size is bounded by events-per-user-day, so collect_list is safe at any
# corpus scale), then the regex count is a per-row JVM scalar. The DuckDB
# oracle builds the identical string with ORDER BY string_agg and the
# same regex, so the driver adjudicates ordering + non-overlapping match
# semantics end to end.
@query(
    "events_pattern",
    sql="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
               string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          ELSE 'e' END, '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day,
           CAST(len(regexp_extract_all(s, 'v+cp')) AS INT) AS n_matches
    FROM seq
    WHERE len(regexp_extract_all(s, 'v+cp')) > 0
    ORDER BY user_id, day
    """,
)
def events_pattern(spark, sf_dir):
    """view+ click purchase pattern counts per user-day event sequence."""
    ev = table(spark, sf_dir, "events")
    day = (
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0))
        .cast("bigint")
        .alias("day")
    )
    letter = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", day, F.struct("ts", "event_id", letter.alias("l")).alias("e"))
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["l"]
                ),
                "",
            ).alias("s")
        )
    )
    n = F.size(F.regexp_extract_all("s", F.lit("v+cp"), F.lit(0)))
    return (
        seq.select("user_id", "day", n.cast("int").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy("user_id", "day")
    )


# RFM segmentation — the classic customer-analytics triple: per-user
# Recency / Frequency / Monetary from one purchase aggregation, quintile
# scores via NTILE over deterministic total orders (metric + user_id
# tiebreak, so both engines tile identically), concatenated into the
# segment label. Scale shape: one grouped pass over purchases, then
# windows over the |users|-sized aggregate — the corpus is never
# re-scanned for scoring. The NTILE windows are globally ordered; at
# billions of users the scale path swaps them for quantile BOUNDARIES
# (agg_approx_quantile / operators/quantile.py) broadcast back as a
# bucket join, trading exact tiling at the boundary for no global sort.
@query(
    "events_rfm",
    sql="""
    WITH p AS (
        SELECT user_id,
               MAX(ts) AS last_ts,
               COUNT(*) AS freq,
               SUM(CAST(round(value * 1000000) AS BIGINT)) AS monet
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id,
           CAST(NTILE(5) OVER (ORDER BY last_ts DESC, user_id) AS INT) AS r,
           CAST(NTILE(5) OVER (ORDER BY freq DESC, user_id) AS INT) AS f,
           CAST(NTILE(5) OVER (ORDER BY monet DESC, user_id) AS INT) AS m,
           CAST(NTILE(5) OVER (ORDER BY last_ts DESC, user_id) AS VARCHAR)
           || CAST(NTILE(5) OVER (ORDER BY freq DESC, user_id) AS VARCHAR)
           || CAST(NTILE(5) OVER (ORDER BY monet DESC, user_id) AS VARCHAR)
               AS segment
    FROM p ORDER BY user_id
    """,
)
def events_rfm(spark, sf_dir):
    """Per-user RFM quintile scores and segment label from purchases."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("freq"),
            F.sum(
                F.round(F.col("value") * 1_000_000).cast("bigint")
            ).alias("monet"),
        )
    )
    r = F.ntile(5).over(W.orderBy(F.desc("last_ts"), F.asc("user_id")))
    f = F.ntile(5).over(W.orderBy(F.desc("freq"), F.asc("user_id")))
    m = F.ntile(5).over(W.orderBy(F.desc("monet"), F.asc("user_id")))
    return p.select(
        "user_id",
        r.cast("int").alias("r"),
        f.cast("int").alias("f"),
        m.cast("int").alias("m"),
        F.concat(
            r.cast("string"), f.cast("string"), m.cast("string")
        ).alias("segment"),
    ).orderBy("user_id")


# Kaplan-Meier survival estimator — time from first activity to first
# purchase, administratively censored at 100h (the standard product-limit
# construction: S(t) = prod over event times t'<=t of 1 - deaths/at_risk,
# computed as exp of an ordered running sum of logs). Scale shape: two
# grouped passes over events build the per-user duration table; every
# window after that runs over the <=101-row distinct-duration table, so
# the global ordering is bounded-cardinality by construction. The oracle
# is the textbook correlated-risk-set formulation.
@query(
    "events_survival",
    sql="""
    WITH first_ev AS (
        SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
    ), first_p AS (
        SELECT user_id, MIN(ts) AS tp FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ), obs AS (
        SELECT CASE WHEN tp IS NOT NULL AND
                    FLOOR((epoch_us(tp) - epoch_us(t0)) / 3600000000.0)
                        <= 100
               THEN CAST(FLOOR((epoch_us(tp) - epoch_us(t0))
                               / 3600000000.0) AS BIGINT)
               ELSE CAST(100 AS BIGINT) END AS d,
               (tp IS NOT NULL AND
                FLOOR((epoch_us(tp) - epoch_us(t0)) / 3600000000.0) <= 100)
                   AS ev
        FROM first_ev LEFT JOIN first_p USING (user_id)
    ), times AS (
        SELECT d AS t, COUNT(*) FILTER (WHERE ev) AS deaths
        FROM obs GROUP BY d HAVING COUNT(*) FILTER (WHERE ev) > 0
    ), risk AS (
        SELECT t, deaths,
               (SELECT COUNT(*) FROM obs WHERE obs.d >= times.t) AS n_risk
        FROM times
    )
    SELECT t, deaths, n_risk,
           ROUND(EXP(SUM(LN(1 - CAST(deaths AS DOUBLE) / n_risk))
                     OVER (ORDER BY t)), 6) AS survival
    FROM risk ORDER BY t
    """,
)
def events_survival(spark, sf_dir):
    """KM survival curve of hours-to-first-purchase, censored at 100h."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    t0 = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    dur = F.floor(
        (F.unix_micros("tp") - F.unix_micros("t0")) / F.lit(3_600_000_000.0)
    )
    obs = (
        t0.join(tp, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull() & (dur <= 100), dur.cast("bigint")
            )
            .otherwise(F.lit(100).cast("bigint"))
            .alias("d"),
            (F.col("tp").isNotNull() & (dur <= 100)).alias("ev"),
        )
    )
    per_d = obs.groupBy(F.col("d").alias("t")).agg(
        F.count("*").alias("cnt"),
        F.count_if("ev").alias("deaths"),
    )
    # at-risk at t = total obs - all obs with smaller duration: one
    # running sum over the bounded distinct-duration table
    w_ord = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    total = obs.count()
    risk = per_d.select(
        "t",
        "deaths",
        (
            F.lit(total)
            - F.coalesce(F.sum("cnt").over(w_ord), F.lit(0))
        ).alias("n_risk"),
    ).filter(F.col("deaths") > 0)
    w_run = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    surv = F.exp(
        F.sum(
            F.log(1 - F.col("deaths").cast("double") / F.col("n_risk"))
        ).over(w_run)
    )
    return risk.select(
        "t", "deaths", "n_risk", F.round(surv, 6).alias("survival")
    ).orderBy("t")
