"""Tier B window functions — T-B21..B26 (SURVEY.md §2.2).

The pandas post-`read` idioms from the reference's workflow (rolling stats,
cumulative aggregates, resampling — README demos †) moved in-engine as Spark
window functions: one shuffle on the partition key, sort within partitions,
then a single pass. Ordering always includes a unique tiebreak (event_id /
orderkey) so results are deterministic and oracle-comparable.

Float discipline: windowed sums accumulate as scaled longs (exact.wsum) —
running double sums would diverge from DuckDB in the last ulps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.catalog import table
from corintick_spark.exact import dsum, wsum, WSUM
from corintick_spark.operators.resample import resample_ohlc as _resample
from corintick_spark.registry import query


# T-B21 — ranking functions.
@query(
    "window_rank",
    sql="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank(spark, sf_dir):
    """row_number/rank/dense_rank/ntile plus lag/lead per priority group —
    one query carrying both T-B21 (ranking) and T-B22 (offset) window
    families over a single shared window spec (one shuffle, one sort)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


# T-B22 — lag/lead per series: tick-to-tick deltas.
@query(
    "window_lag",
    sql="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - LAG(value) OVER w AS delta,
           LAG(ts) OVER w AS prev_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag(spark, sf_dir):
    """Per-uid lag/lead — corintick users' df.diff()/shift() after read †."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lag("ts").over(w).alias("prev_ts"),
    )


# T-B23 — rolling rows-frame aggregates.
@query(
    "window_rolling",
    sql=f"""
    SELECT event_id, user_id, value,
           {WSUM('value', 'w')} AS roll_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
           CAST(MAX(value) OVER w AS DOUBLE) AS roll_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling(spark, sf_dir):
    """5-tick rolling sum/count/max per uid (pandas .rolling(5) analogue †)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        wsum("value", w).alias("roll_sum"),
        F.count("*").over(w).cast("bigint").alias("roll_n"),
        F.max("value").over(w).cast("double").alias("roll_max"),
    )


# T-B24 — time-range frame: trailing 1h stats at every tick.
@query(
    "window_vwap",
    sql=f"""
    SELECT event_id, user_id, ts,
           {WSUM('value', 'w')} AS sum_1h,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           {WSUM('value', 'w')} / COUNT(*) OVER w AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_vwap(spark, sf_dir):
    """Trailing-1h rolling aggregate per uid over irregular ticks — a
    rangeBetween frame on the µs epoch (pandas .rolling('1H') analogue †)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    s = wsum("value", w)
    n = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        s.alias("sum_1h"),
        n.cast("bigint").alias("n_1h"),
        (s / n).alias("avg_1h"),
    )


# T-B25 — cumulative aggregates per series.
@query(
    "window_cumsum",
    sql=f"""
    SELECT event_id, user_id, ts,
           {WSUM('value', 'w')} AS cum_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS cum_n,
           CAST(MIN(value) OVER w AS DOUBLE) AS cum_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_cumsum(spark, sf_dir):
    """Running sum/count/min per uid (pandas .cumsum() analogue †)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        wsum("value", w).alias("cum_sum"),
        F.count("*").over(w).cast("bigint").alias("cum_n"),
        F.min("value").over(w).cast("double").alias("cum_min"),
    )


# T-B26 — resample to OHLC bars (operators/resample.py).
@query(
    "resample_ohlc",
    sql=f"""
    SELECT user_id, date_trunc('hour', ts) AS bucket,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           COUNT(*) AS n_ticks,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS total_value
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def resample_ohlc(spark, sf_dir):
    """Hourly OHLC bars per uid — the canonical tick-store downsample
    (pandas df.resample('1H').ohlc() after corintick read †), as one
    map-side-combining hash aggregate."""
    ev = table(spark, sf_dir, "events")
    return _resample(ev, key="user_id", ts="ts", value="value", freq="hour")


# Hypertable-style continuous aggregate: one pass producing multi-resolution
# rollups (minute -> hour -> day) via a resolution dimension.
@query(
    "rollup_multires",
    sql=f"""
    SELECT res, bucket, event_type, COUNT(*) AS n, {{dsum_sql}}
    FROM (
        SELECT 'hour' AS res, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
               event_type, value FROM events
        UNION ALL
        SELECT 'day' AS res, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               event_type, value FROM events
    )
    GROUP BY res, bucket, event_type
    """.format(dsum_sql="CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS total_value"),
)
def rollup_multires(spark, sf_dir):
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    pattern): explode each event into its (resolution, bucket) memberships,
    aggregate once — one shuffle for every resolution level together."""
    ev = table(spark, sf_dir, "events")
    tagged = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hour").alias("res"),
                    F.date_trunc("hour", F.col("ts")).alias("bucket"),
                ),
                F.struct(
                    F.lit("day").alias("res"),
                    F.date_trunc("day", F.col("ts")).alias("bucket"),
                ),
            )
        ).alias("rb"),
        F.col("event_type"),
        F.col("value"),
    )
    return (
        tagged.select("rb.res", "rb.bucket", "event_type", "value")
        .groupBy("res", "bucket", "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


# Time-weighted average (TWAP) per uid: each tick weighted by its holding
# time until the next tick — the canonical irregular-series average.
@query(
    "window_twap",
    sql="""
    WITH t AS (
        SELECT user_id, value,
               (CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT)
                - CAST(epoch_us(ts) AS BIGINT)) / 1000000.0 AS dt_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value * dt_s AS DECIMAL(38,6))) AS DOUBLE)
               / NULLIF(CAST(SUM(CAST(dt_s AS DECIMAL(38,6))) AS DOUBLE), 0), 6) AS twap,
           COUNT(dt_s) AS n_weighted
    FROM t
    WHERE dt_s IS NOT NULL
    GROUP BY user_id
    """,
)
def window_twap(spark, sf_dir):
    """TWAP per uid: value weighted by seconds-to-next-tick (lead window),
    aggregated with decimal accumulation — the weighted products exceed the
    scaled-long budget, so this takes the dsum_wide path (exact.py)."""
    from corintick_spark.exact import dsum_wide

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        "value",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")))
            / 1_000_000.0
        ).alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull())
    num = F.sum((F.col("value") * F.col("dt_s")).cast("decimal(38,6)")).cast("double")
    den = F.nullif(F.sum(F.col("dt_s").cast("decimal(38,6)")).cast("double"), F.lit(0.0))
    return t.groupBy("user_id").agg(
        F.round(num / den, 6).alias("twap"),
        F.count("dt_s").alias("n_weighted"),
    )


# Gap-filled regular grid with forward-fill (pandas resample().ffill()).
@query(
    "resample_ffill",
    sql="""
    WITH bounds AS (
        -- FLOOR, not integer // (which truncates toward zero): pre-1970
        -- negative-epoch micros must round DOWN so the grid invariant
        -- (first slot strictly after t0, last slot at/before t1) holds
        SELECT user_id,
               CAST(FLOOR(epoch_us(MIN(ts)) / 3600000000.0) AS BIGINT) + 1 AS s0,
               CAST(FLOOR(epoch_us(MAX(ts)) / 3600000000.0) AS BIGINT) AS s1
        FROM events GROUP BY user_id
    ), grid AS (
        SELECT user_id, make_timestamp(CAST(s * 3600000000 AS BIGINT)) AS grid_ts
        FROM bounds, UNNEST(range(s0, s1 + 1)) t(s)
    )
    SELECT g.user_id, g.grid_ts,
           (SELECT e.value FROM events e
            WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS ffill_value
    FROM grid g
    """,
)
def resample_ffill(spark, sf_dir):
    """Hourly gap-filled grid per uid with forward-filled values — grid
    built distributed via sequence()+explode, filled in one window pass
    (operators/resample.py::resample_ffill)."""
    from corintick_spark.operators.resample import resample_ffill as _ffill

    ev = table(spark, sf_dir, "events")
    return _ffill(ev, key="user_id", ts="ts", value="value", step_s=3600)


# Log-returns + per-uid-per-day realized volatility.
@query(
    "window_returns",
    sql="""
    WITH r0 AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_id, value,
               LAG(value) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
        SELECT user_id, day,
               ROUND(LN(value / prev), 6) AS log_ret
        FROM r0
        WHERE value > 0 AND prev > 0
    )
    SELECT user_id, day,
           COUNT(log_ret) AS n_returns,
           ROUND(SQRT(CAST(SUM(CAST(log_ret * log_ret AS DECIMAL(38,12))) AS DOUBLE)), 6) AS realized_vol
    FROM r
    GROUP BY user_id, day
    """,
)
def window_returns(spark, sf_dir):
    """Tick-to-tick log returns per uid (lag window) aggregated to daily
    realized volatility — the post-read pandas quant idiom in-engine.
    Returns are rounded before squaring so both engines square identical
    doubles; the sum is decimal-exact."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r0 = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "value",
        F.lag("value").over(w).alias("prev"),
    ).filter((F.col("value") > 0) & (F.col("prev") > 0))
    r = r0.select(
        "user_id",
        "day",
        F.round(F.log(F.col("value") / F.col("prev")), 6).alias("log_ret"),
    )
    return r.groupBy("user_id", "day").agg(
        F.count("log_ret").alias("n_returns"),
        F.round(
            F.sqrt(
                F.sum((F.col("log_ret") * F.col("log_ret")).cast("decimal(38,12)")).cast(
                    "double"
                )
            ),
            6,
        ).alias("realized_vol"),
    )


# Cross-sectional z-score: each tick scored against the same-hour population
# across all uids (the cross-entity normalization quant pipelines run).
@query(
    "window_zscore",
    sql="""
    WITH b AS (
        SELECT event_id, user_id, value,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket
        FROM events
    ), stats AS (
        SELECT bucket,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s1,
               CAST(SUM(CAST(round(value * value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s2,
               COUNT(*) AS n
        FROM b GROUP BY bucket
    )
    SELECT b.event_id, b.user_id, b.bucket,
           ROUND(CASE WHEN stats.n < 2 OR stats.s2 / stats.n - (stats.s1 / stats.n) * (stats.s1 / stats.n) <= 0 THEN 0.0
                 ELSE (b.value - stats.s1 / stats.n)
                      / SQRT(stats.s2 / stats.n - (stats.s1 / stats.n) * (stats.s1 / stats.n))
                 END, 6) AS zscore
    FROM b JOIN stats ON b.bucket = stats.bucket
    """,
)
def window_zscore(spark, sf_dir):
    """Cross-sectional z-score per hourly bucket: exact scaled sums for mean
    and second moment (order-independent), identical arithmetic both
    engines, rounded output."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        "user_id",
        "value",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    s1 = F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double") / 1_000_000
    s2 = (
        F.sum(F.round(F.col("value") * F.col("value") * 1_000_000).cast("bigint")).cast("double")
        / 1_000_000
    )
    stats = b.groupBy("bucket").agg(
        s1.alias("s1"), s2.alias("s2"), F.count("*").alias("n")
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    return (
        b.join(stats, "bucket")
        .select(
            "event_id",
            "user_id",
            "bucket",
            F.round(
                F.when((F.col("n") < 2) | (var <= 0), F.lit(0.0)).otherwise(
                    (F.col("value") - mean) / F.sqrt(var)
                ),
                6,
            ).alias("zscore"),
        )
    )


# Bollinger bands: rolling mean +/- 2 sigma over a 20-tick frame per uid.
@query(
    "window_bollinger",
    sql="""
    WITH f AS (
        SELECT event_id, user_id, value,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000 AS s1,
               CAST(SUM(CAST(round(value * value * 1000) AS BIGINT)) OVER w AS DOUBLE) / 1000 AS s2,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, value, n,
           ROUND(s1 / n, 6) AS mid,
           ROUND(s1 / n + 2 * SQRT(greatest(s2 / n - (s1 / n) * (s1 / n), 0)), 6) AS upper,
           ROUND(s1 / n - 2 * SQRT(greatest(s2 / n - (s1 / n) * (s1 / n), 0)), 6) AS lower
    FROM f
    """,
)
def window_bollinger(spark, sf_dir):
    """20-tick Bollinger bands per uid from exact scaled rolling moments —
    rolling stddev without float accumulation divergence."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    s1 = F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).over(w).cast("double") / 1_000_000
    s2 = F.sum(F.round(F.col("value") * F.col("value") * 1_000).cast("bigint")).over(w).cast("double") / 1_000
    n = F.count("*").over(w).cast("bigint")
    mean = s1 / n
    sd = F.sqrt(F.greatest(s2 / n - mean * mean, F.lit(0.0)))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        n.alias("n"),
        F.round(mean, 6).alias("mid"),
        F.round(mean + 2 * sd, 6).alias("upper"),
        F.round(mean - 2 * sd, 6).alias("lower"),
    )


# first_value / last_value / nth_value over the full-partition frame.
@query(
    "window_first_last",
    sql="""
    SELECT event_id, user_id, value,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v,
           nth_value(value, 3) OVER w AS third_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf_dir):
    """first/last/nth value per uid over the whole series (explicit
    unbounded frame — the default frame would stop at CURRENT ROW)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
    )


# lag/lead with offsets and defaults.
@query(
    "window_lag_default",
    sql="""
    SELECT event_id, user_id, value,
           LAG(value, 2, -1.0) OVER w AS lag2_or_neg1,
           LEAD(value, 3, 0.0) OVER w AS lead3_or_zero
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_default(spark, sf_dir):
    """Multi-offset lag/lead with default fill values (series edges get the
    default instead of NULL)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 2, -1.0).over(w).alias("lag2_or_neg1"),
        F.lead("value", 3, 0.0).over(w).alias("lead3_or_zero"),
    )


# Quantile binning: ntile deciles within each returnflag over a total order
# (quantity + unique keys) — both engines distribute remainder rows to the
# leading buckets, so the binning is deterministic and oracle-comparable.
@query(
    "window_ntile",
    sql="""
    WITH t AS (
        SELECT l_returnflag AS flag, l_quantity AS qty,
               CAST(NTILE(10) OVER (PARTITION BY l_returnflag
                   ORDER BY l_quantity, l_orderkey, l_linenumber) AS INTEGER)
                   AS decile
        FROM lineitem
    )
    SELECT flag, decile, COUNT(*) AS n,
           CAST(MIN(qty) AS DOUBLE) AS min_qty,
           CAST(MAX(qty) AS DOUBLE) AS max_qty
    FROM t GROUP BY flag, decile
    """,
)
def window_ntile(spark, sf_dir):
    """Decile binning of quantity per returnflag (quantile-bucket stats)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").alias("qty"),
            F.ntile(10).over(w).cast("int").alias("decile"),
        )
        .groupBy("flag", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("qty").cast("double").alias("min_qty"),
            F.max("qty").cast("double").alias("max_qty"),
        )
    )


# Maximum drawdown per user: exact running sum (scaled-long), running max of
# that sum, drawdown = peak - current. Three stacked windows over ONE
# (user_id, ts, event_id) sort — a single exchange+sort physically.
@query(
    "window_drawdown",
    sql=f"""
    WITH c AS (
        SELECT user_id, ts, event_id,
               {WSUM('value', 'w')} AS cum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), d AS (
        SELECT user_id,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cum AS dd
        FROM c
    )
    SELECT user_id, ROUND(MAX(dd), 6) AS max_drawdown,
           COUNT(*) AS n_events
    FROM d GROUP BY user_id
    """,
)
def window_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative value series per user."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.select(
        "user_id", "ts", "event_id", wsum("value", w).alias("cum")
    )
    d = c.select(
        "user_id", (F.max("cum").over(w) - F.col("cum")).alias("dd")
    )
    return d.groupBy("user_id").agg(
        F.round(F.max("dd"), 6).alias("max_drawdown"),
        F.count("*").alias("n_events"),
    )


# Gaps-and-islands: consecutive same-type runs via the row_number-difference
# trick (rn over user minus rn over user+type is constant within a run).
@query(
    "window_islands",
    sql="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    )
    SELECT user_id, event_type,
           CAST(rn_all - rn_type AS BIGINT) AS island_id,
           COUNT(*) AS run_len,
           MIN(ts) AS run_start, MAX(ts) AS run_end
    FROM o GROUP BY user_id, event_type, rn_all - rn_type
    """,
)
def window_islands(spark, sf_dir):
    """Run-length encoding of consecutive same-type event streaks."""
    ev = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    o = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type))
        .cast("bigint")
        .alias("island_id"),
    )
    return o.groupBy("user_id", "event_type", "island_id").agg(
        F.count("*").alias("run_len"),
        F.min("ts").alias("run_start"),
        F.max("ts").alias("run_end"),
    )


# Percent change vs previous observation (returns in percent space): the
# LAG pair is identical in both engines, so the division+round is too.
@query(
    "window_pct_change",
    sql="""
    SELECT event_id, user_id, value,
           FLOOR((value - LAG(value) OVER w)
                 / NULLIF(LAG(value) OVER w, 0) * 1000000) / 1000000 AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_pct_change(spark, sf_dir):
    """Per-user percent change of value between consecutive events.
    Quantized with exact.q6 (floor), not ROUND — see q6's docstring for the
    shortest-repr midpoint divergence this avoids."""
    from corintick_spark.exact import q6

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        q6((F.col("value") - prev) / F.nullif(prev, F.lit(0))).alias(
            "pct_change"
        ),
    )


# Rolling correlation — the pairs-trading / regime-detection staple:
# Pearson corr of (value, previous value) over a trailing 20-pair frame
# per user. Same engine-parity recipe as agg_corr, but the five moment
# sums are WINDOWED scaled-long sums over the identical frame, so every
# per-row correlation is a pure expression over exact integers — one
# (user_id) exchange, one sort, five frame aggregates sharing the window.
@query(
    "window_rolling_corr",
    sql="""
    WITH lagged AS (
        SELECT event_id, user_id, ts, value AS x,
               LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS y
        FROM events WHERE value IS NOT NULL
    ), p AS (
        SELECT * FROM lagged WHERE y IS NOT NULL
    ), m AS (
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n,
               CAST(SUM(CAST(round(x * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000 AS sx,
               CAST(SUM(CAST(round(y * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000 AS sy,
               CAST(SUM(CAST(round(x * x * 1000) AS BIGINT)) OVER w AS DOUBLE) / 1000 AS sxx,
               CAST(SUM(CAST(round(y * y * 1000) AS BIGINT)) OVER w AS DOUBLE) / 1000 AS syy,
               CAST(SUM(CAST(round(x * y * 1000) AS BIGINT)) OVER w AS DOUBLE) / 1000 AS sxy
        FROM p
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, n,
           -- GREATEST(...,0): scaled-long quantization can leave a tiny
           -- negative variance residue on constant frames; DuckDB SQRT
           -- raises on negatives (Spark yields NaN) — clamp both engines
           -- + 0.0 collapses IEEE -0.0 to 0.0 (engines disagree on the
           -- rounded zero's sign; the values hash by repr)
           ROUND((n * sxy - sx * sy)
                 / NULLIF(SQRT(GREATEST(n * sxx - sx * sx, 0))
                          * SQRT(GREATEST(n * syy - sy * sy, 0)), 0), 6)
               + 0.0 AS rho
    FROM m
    """,
)
def window_rolling_corr(spark, sf_dir):
    """Rolling 20-pair Pearson correlation of value vs its lag per user."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.select(
            "event_id", "user_id", "ts", F.col("value").alias("x"),
            F.lag("value").over(wl).alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )

    def ssum(e, scale):
        return (
            F.sum(F.round(e * scale).cast("bigint")).over(w).cast("double") / scale
        )

    m = p.select(
        "event_id", "user_id", "ts",
        F.count("*").over(w).alias("n"),
        ssum(F.col("x"), 1_000_000).alias("sx"),
        ssum(F.col("y"), 1_000_000).alias("sy"),
        ssum(F.col("x") * F.col("x"), 1_000).alias("sxx"),
        ssum(F.col("y") * F.col("y"), 1_000).alias("syy"),
        ssum(F.col("x") * F.col("y"), 1_000).alias("sxy"),
    )
    # greatest(...,0) mirrors the oracle's clamp: quantization can leave a
    # tiny negative variance residue on constant frames
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.sqrt(F.greatest(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)))
        * F.sqrt(F.greatest(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))),
        F.lit(0.0),
    )
    # + 0.0: collapse IEEE -0.0 to 0.0 (sign of the rounded zero differs
    # between engines and the driver hashes values by repr)
    return m.select(
        "event_id", "user_id", "ts", "n",
        (F.round(rho, 6) + F.lit(0.0)).alias("rho"),
    )


# Per-key min-max normalization — the feature-scaling primitive before
# model input: x' = (x - min)/(max - min) over the user's own range.
# Whole-partition window aggregates on the shared (user_id) exchange;
# constant series (max == min) normalize to NULL by contract (no
# information), identical in both engines via NULLIF.
@query(
    "window_minmax_scale",
    sql="""
    SELECT event_id, user_id, value,
           ROUND((value - MIN(value) OVER w)
                 / NULLIF(MAX(value) OVER w - MIN(value) OVER w, 0), 6)
               AS scaled
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def window_minmax_scale(spark, sf_dir):
    """Each user's values min-max scaled into [0, 1]."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id")
    lo, hi = F.min("value").over(w), F.max("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round((F.col("value") - lo) / F.nullif(hi - lo, F.lit(0.0)), 6).alias(
            "scaled"
        ),
    )


# One-sided CUSUM change detection per user — the classic Page (1954)
# control chart. The recursive definition s_i = max(0, s_{i-1} + d_i)
# looks like a sequential fold (events_throttle's class), but it has a
# closed window form: s_i = P_i − min(0, min_{j≤i} P_j) with P the running
# sum of deviations — so it stays a pure two-window plan (one shuffle on
# user_id, one sort, two passes over the frame) instead of a per-key
# list fold. Deviations are scaled longs (reference level 250), so every
# prefix sum / running min is exact integer arithmetic in both engines.
@query(
    "window_cusum",
    sql="""
    WITH d AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 1000000) AS BIGINT) - 250000000 AS dev
        FROM events
        WHERE value IS NOT NULL
    ), p AS (
        SELECT user_id, event_id, ts,
               SUM(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS pre
        FROM d
    ), s AS (
        SELECT user_id, event_id,
               pre - LEAST(MIN(pre) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING),
                           0) AS cu
        FROM p
    )
    SELECT user_id, event_id,
           CAST(cu AS DOUBLE) / 1000000 AS cusum,
           (cu > 500000000) AS alarm
    FROM s
    """,
)
def window_cusum(spark, sf_dir):
    """Per-user one-sided CUSUM (level 250, alarm at +500) via the
    prefix-sum/running-min closed form — no sequential fold needed."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dev = (F.round(F.col("value") * 1_000_000).cast("bigint")
           - F.lit(250_000_000))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = ev.select(
        "user_id", "event_id", "ts", F.sum(dev).over(wp).alias("pre")
    )
    cu = F.col("pre") - F.least(F.min("pre").over(wp), F.lit(0))
    return p.select(
        "user_id",
        "event_id",
        (cu.cast("double") / F.lit(1_000_000)).alias("cusum"),
        (cu > F.lit(500_000_000)).alias("alarm"),
    )


# Windowed DISTINCT aggregation — a shape Spark's window functions do NOT
# support natively (COUNT(DISTINCT) OVER raises); the engine expresses it
# via operators/running_distinct.py, whose contract ENFORCES the rewrite's
# memory constraint: collect_set state is bounded by the column's
# distinct-value cardinality, so the operator probes approx_count_distinct
# and raises on unbounded columns (use the HLL sketch tier there). Here
# event_type is a 4-value domain — well inside the bound. DuckDB runs the
# native COUNT(DISTINCT ...) OVER, so agreement proves the rewrite exact,
# including NULL handling (collect_set skips NULLs; COUNT(DISTINCT col)
# does too).
@query(
    "window_distinct",
    sql="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(DISTINCT event_type)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS types_seen
    FROM events
    """,
)
def window_distinct(spark, sf_dir):
    """Running distinct event_type count per user — COUNT(DISTINCT) OVER
    via the cardinality-guarded collect_set window rewrite."""
    from corintick_spark.operators.running_distinct import (
        running_distinct_count,
    )

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        running_distinct_count(ev, "event_type", w).alias("types_seen"),
    )
