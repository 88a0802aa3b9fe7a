"""Tier B relational surface — joins T-B7..B14, aggregations T-B15..B20,
sorts/top-k T-B27..B29, set ops T-B30..B31 (SURVEY.md §2.2).

corintick has no joins or general aggregation (SURVEY.md §2.1 verdict —
analytics happened client-side in pandas after `read` †); this module is the
in-engine replacement. Scale notes inline: dimension joins broadcast, fact
joins shuffle on their keys with AQE skew handling, aggregations are
partial+final hash aggregates (map-side combine).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.catalog import table
from corintick_spark.exact import dsum, DSUM
from corintick_spark.operators.asof import asof_join
from corintick_spark.registry import query


REVENUE = "l_extendedprice * (1 - l_discount)"


# T-B7 — inner equi-join, fact⋈fact: shuffle join on orderkey (both sides
# large at scale → sort-merge; AQE may demote to shuffled-hash).
@query(
    "join_inner",
    sql=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {DSUM(REVENUE.replace('l_', 'l.l_'), 'revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderpriority
    """,
)
def join_inner(spark, sf_dir):
    """Fact-to-fact inner equi-join + aggregation (revenue by priority)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.expr(REVENUE), "revenue"),
        )
    )


# T-B8 — star join with broadcast dimensions: zero shuffles for the dim side.
@query(
    "join_broadcast",
    sql=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_items,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark, sf_dir):
    """Star join: fact lineitem against broadcast supplier→nation→region.
    At 100 TB the dims stay a few MB — broadcasting removes every shuffle
    except the final aggregation's."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.expr(REVENUE), "revenue"),
        )
    )


# T-B9 — outer join keeping customers without orders.
@query(
    "join_outer",
    sql=f"""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           {DSUM('o.o_totalprice', 'total_spend')}
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_outer(spark, sf_dir):
    """Left outer join: order counts per customer including zero-order ones
    (COUNT over nulls → 0, SUM over empty → NULL in both engines)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
    )


# T-B10 — semi join: customers with ≥1 high-value open order.
@query(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderstatus = 'O' AND o.o_totalprice > 100000
    )
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi join (EXISTS): no row multiplication, broadcastable probe."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    probe = o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
    return c.join(probe, c.c_custkey == probe.o_custkey, "leftsemi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# T-B10 — anti join: customers with no orders at all.
@query(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — corintick's overlap rejection inverted."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "leftanti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# T-B11 — non-equi range join bounded by an equi key (user_id) so the
# cross-product stays within key groups — survives scale-up, unlike a pure
# theta join.
@query(
    "join_range",
    sql="""
    SELECT a.event_id AS purchase_id, a.user_id,
           COUNT(*) AS n_follow
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id, a.user_id
    """,
)
def join_range(spark, sf_dir):
    """Range join: events within 1h after each purchase, per user. The equi
    component (user_id) makes this a shuffled equi-join with a range residual,
    not a BNLJ."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("user_id").alias("b_user_id"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_id"),
    )
    cond = (
        (a.user_id == b.b_user_id)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return a.join(b, cond).groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_follow")
    )


# T-B12 — as-of join via the union+window operator (operators/asof.py).
@query(
    "join_asof",
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.event_id AS last_purchase_id,
           p.ts       AS last_purchase_ts,
           p.value    AS last_purchase_value
    FROM events v
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.ts, e.value
        FROM events e
        WHERE e.user_id = v.user_id
          AND e.event_type = 'purchase'
          AND e.ts <= v.ts
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) p ON TRUE
    WHERE v.event_type = 'view'
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each view ← latest prior purchase per user. corintick
    users ran pandas.merge_asof after read (SURVEY.md T-B12 †); here it is
    one shuffle + one window — no per-row lookups."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
        tiebreak="event_id",
        prefix="p_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("p_event_id").alias("last_purchase_id"),
        F.col("p_ts").alias("last_purchase_ts"),
        F.col("p_value").alias("last_purchase_value"),
    )


# As-of join with a STALENESS BOUND (pandas merge_asof(tolerance=...)):
# a prior match older than the tolerance is as good as no match — the
# common tick-data rule ("use the last quote, but never one from before
# the halt"). Same single-shuffle window plan as join_asof; the bound is a
# post-window null-out, not a different join.
@query(
    "join_asof_tolerance",
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.event_id AS last_purchase_id,
           p.ts       AS last_purchase_ts,
           p.value    AS last_purchase_value
    FROM events v
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.ts, e.value
        FROM events e
        WHERE e.user_id = v.user_id
          AND e.event_type = 'purchase'
          AND e.ts <= v.ts
          AND e.ts >= v.ts - INTERVAL 30 MINUTE
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) p ON TRUE
    WHERE v.event_type = 'view'
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """Each view ← latest prior purchase per user IF within 30 minutes,
    else NULLs (the row is kept). Tolerance applied after the as-of window:
    a purchase inside the window is by construction the latest one, so
    nulling stale matches equals the oracle's bounded LATERAL subquery."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
        tiebreak="event_id",
        prefix="p_",
    )
    fresh = F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("p_event_id")).alias("last_purchase_id"),
        F.when(fresh, F.col("p_ts")).alias("last_purchase_ts"),
        F.when(fresh, F.col("p_value")).alias("last_purchase_value"),
    )


# T-B15 — TPC-H Q1-style partial+final hash aggregation.
@query(
    "agg_basic",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity', 'sum_qty')},
           {DSUM('l_extendedprice', 'sum_base_price')},
           {DSUM('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           CAST(SUM(CAST(round(l_quantity * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark, sf_dir):
    """Pricing-summary aggregation (TPC-H Q1 shape) — map-side partial agg
    then final agg, all in whole-stage codegen."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.expr("l_extendedprice * (1 - l_discount)")
    charge = F.expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (
                F.sum(F.round(F.col("l_quantity") * 1_000_000).cast("bigint")).cast("double")
                / 1_000_000
                / F.count("l_quantity")
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# T-B16 — distinct + count-distinct (expand + two-phase agg).
@query(
    "agg_distinct",
    sql="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


# T-B17 — approx distinct (HLL++). Sketch output is engine-specific →
# rows-only check (no oracle SQL). Self-describing invariant columns make
# the rows-only adjudication informative: the exact distinct count rides
# along, `inv_rel_err` is the sketch's observed relative error, and
# `inv_ok` asserts it within 5x the configured 2% rsd — a bound a broken
# sketch implementation cannot fake.
@query("agg_approx", sql=None)
def agg_approx(spark, sf_dir):
    """approx_count_distinct via HyperLogLog++ — the 100 TB path for
    cardinality (fixed-size sketch, no expand) — next to the exact count
    and its error invariant."""
    o = table(spark, sf_dir, "orders")
    rel_err = F.abs(
        F.col("approx_customers") - F.col("exact_customers")
    ) / F.col("exact_customers")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias(
                "approx_customers"
            ),
            F.count_distinct("o_custkey").alias("exact_customers"),
            F.count("*").alias("n_orders"),
        )
        .withColumn("inv_rel_err", F.round(rel_err, 6))
        .withColumn("inv_ok", rel_err <= F.lit(0.10))
    )


# T-B18 — rollup with grouping id.
@query(
    "agg_rollup",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grp,
           COUNT(*) AS n_orders,
           {DSUM('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical rollup (status → priority → grand total) with grouping id."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority").agg(
            F.grouping_id().cast("bigint").alias("grp"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


# T-B19 — conditional aggregation.
@query(
    "agg_conditional",
    sql=f"""
    SELECT l_returnflag,
           {DSUM("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END", 'discounted_rev')},
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(F.lit(0.0)),
            "discounted_rev",
        ),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.count("*").alias("n"),
    )


# T-B20 — collect_list: per-uid series re-assembly (corintick chunk rebuild
# analogue, serialization.py::build_dataframe †).
@query(
    "agg_collect",
    sql="""
    SELECT user_id,
           COUNT(*) AS n,
           array_to_string(list_sort(list(printf('%.2f', value))), ',') AS values_sorted
    FROM events
    GROUP BY user_id
    """,
)
def agg_collect(spark, sf_dir):
    """collect_list + array_sort, emitted as a comma-joined string: the
    driver's pandas canonicalizer cannot hash array cells (the one red
    CORRECTNESS row in round 1), so both engines serialize the sorted list
    to a scalar. Values are fixed-formatted to 2 decimals (the data's native
    precision) so neither engine's shortest-double-repr policy leaks in, and
    sorting is lexicographic on that fixed form in both engines."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.array_join(
            # when(): Spark's format_string renders NULL as the string
            # 'null' (DuckDB's printf yields NULL, dropped by
            # array_to_string) — collect only observed values in both
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("value").isNotNull(),
                        F.format_string("%.2f", "value"),
                    )
                )
            ),
            ",",
        ).alias("values_sorted"),
    )


# T-B28 — global top-k → TakeOrderedAndProject (no full sort at scale).
@query(
    "topk_global",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
    )


# T-B29 — top-k per group via ranking window.
@query(
    "topk_per_group",
    sql="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS BIGINT) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — single shuffle on the group key."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# T-B30/B31 — set operations.
@query(
    "set_ops",
    sql="""
    SELECT nationkey, 'intersect' AS op FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'except' AS op FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def set_ops(spark, sf_dir):
    """INTERSECT + EXCEPT of customer vs supplier nations, tagged and unioned."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    inter = c.intersect(s).withColumn("op", F.lit("intersect"))
    exc = c.subtract(s).withColumn("op", F.lit("except"))
    return inter.unionByName(exc)


# Exact interpolated percentiles (Spark `percentile` == DuckDB quantile_cont).
@query(
    "agg_percentile",
    sql="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (sorted-agg path). At 100 TB
    prefer approx_percentile (t-digest sketch, no sort) — exact kept here
    because it is oracle-checkable; rounded to absorb interpolation ulps."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n"),
    )


# T-B18 — full cube with grouping id.
@query(
    "agg_cube",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grp,
           COUNT(*) AS n,
           {DSUM('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one pass
    (Expand + single shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("grp"),
        F.count("*").alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


# Pivot: long -> wide aggregation (event counts per user by type).
@query(
    "agg_pivot",
    sql=f"""
    SELECT user_id,
           {DSUM("CASE WHEN event_type = 'click' THEN value ELSE NULL END", 'click_total')},
           {DSUM("CASE WHEN event_type = 'view' THEN value ELSE NULL END", 'view_total')},
           {DSUM("CASE WHEN event_type = 'purchase' THEN value ELSE NULL END", 'purchase_total')},
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot to wide per-type totals. Explicit value list keeps it a single
    pass (no distinct-values pre-query) — required practice at scale."""
    ev = table(spark, sf_dir, "events")
    from corintick_spark.exact import SCALE
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum(F.round(F.col("value") * SCALE).cast("bigint")))
    )
    counts = table(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("n"))
    return (
        pivoted.join(counts, "user_id")
        .select(
            "user_id",
            (F.col("click").cast("double") / SCALE).alias("click_total"),
            (F.col("view").cast("double") / SCALE).alias("view_total"),
            (F.col("purchase").cast("double") / SCALE).alias("purchase_total"),
            "n",
        )
    )


# Analytic distribution functions: percent_rank / cume_dist.
@query(
    "window_percent",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(10) OVER w AS BIGINT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent(spark, sf_dir):
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


# Correlated scalar subquery: orders above their status-group mean.
@query(
    "subquery_scalar",
    sql="""
    WITH m AS (
        SELECT o_orderstatus,
               CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000 / COUNT(*) AS mean_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, m.mean_price
    FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus
    WHERE o.o_totalprice > m.mean_price
    """,
)
def subquery_scalar(spark, sf_dir):
    """Orders above their group mean — the correlated-scalar-subquery shape,
    planned as an aggregate + broadcast re-join (what Catalyst rewrites such
    subqueries into anyway)."""
    o = table(spark, sf_dir, "orders")
    from corintick_spark.exact import SCALE
    m = o.groupBy("o_orderstatus").agg(
        (
            F.sum(F.round(F.col("o_totalprice") * SCALE).cast("bigint")).cast("double")
            / SCALE
            / F.count("*")
        ).alias("mean_price")
    )
    return (
        o.join(F.broadcast(m), "o_orderstatus")
        .filter(F.col("o_totalprice") > F.col("mean_price"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "mean_price")
    )


# Value histogram per group (width_bucket binning).
@query(
    "agg_histogram",
    sql="""
    SELECT event_type,
           CASE WHEN value < 0 THEN CAST(0 AS BIGINT)
                WHEN value >= 200 THEN CAST(21 AS BIGINT)
                ELSE CAST(FLOOR(value / 10) AS BIGINT) + 1 END AS bin,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS bin_min,
           CAST(MAX(value) AS DOUBLE) AS bin_max
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark, sf_dir):
    """20-bin value histogram per event type — width_bucket + hash agg, the
    one-pass distributed histogram."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.expr("width_bucket(value, 0, 200, 20)").cast("bigint").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("bin_min"),
            F.max("value").cast("double").alias("bin_max"),
        )
    )


# As-of join, forward direction with tolerance (merge_asof parity).
@query(
    "join_asof_forward",
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.event_id AS next_purchase_id,
           p.ts       AS next_purchase_ts
    FROM events v
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.ts
        FROM events e
        WHERE e.user_id = v.user_id
          AND e.event_type = 'purchase'
          AND e.ts >= v.ts
          AND e.ts <= v.ts + INTERVAL 3 DAYS
        ORDER BY e.ts ASC, e.event_id ASC
        LIMIT 1
    ) p ON TRUE
    WHERE v.event_type = 'view'
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of with 3-day tolerance: each view -> next purchase within
    3 days (merge_asof direction='forward', tolerance)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(
        views, purchases, on="user_id", ts="ts", right_cols=["event_id"],
        tiebreak="event_id", prefix="p_", direction="forward",
        tolerance_us=3 * 24 * 3600 * 1_000_000,
    )
    return j.select(
        "event_id", "user_id", "ts",
        F.col("p_event_id").alias("next_purchase_id"),
        F.col("p_ts").alias("next_purchase_ts"),
    )


# As-of join, nearest direction (closer of prior/next; backward wins ties).
@query(
    "join_asof_nearest",
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.event_id AS nearest_purchase_id,
           p.ts       AS nearest_purchase_ts
    FROM events v
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.ts
        FROM events e
        WHERE e.user_id = v.user_id AND e.event_type = 'purchase'
        ORDER BY ABS(CAST(epoch_us(e.ts) AS BIGINT) - CAST(epoch_us(v.ts) AS BIGINT)) ASC,
                 CASE WHEN e.ts <= v.ts THEN 0 ELSE 1 END ASC,
                 CASE WHEN e.ts <= v.ts THEN -e.event_id ELSE e.event_id END ASC
        LIMIT 1
    ) p ON TRUE
    WHERE v.event_type = 'view'
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of: closer of last-prior / next-following purchase per
    view (backward wins exact distance ties) — merge_asof direction='nearest'."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(
        views, purchases, on="user_id", ts="ts", right_cols=["event_id"],
        tiebreak="event_id", prefix="p_", direction="nearest",
    )
    return j.select(
        "event_id", "user_id", "ts",
        F.col("p_event_id").alias("nearest_purchase_id"),
        F.col("p_ts").alias("nearest_purchase_ts"),
    )


# Pearson correlation from exact scaled moments (pandas df.corr() analogue).
@query(
    "agg_corr",
    sql="""
    WITH x AS (
        SELECT event_type, value AS v,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        FROM events
    ), m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS sv,
               CAST(SUM(CAST(round(k * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS sk,
               CAST(SUM(CAST(round(v * v * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS svv,
               CAST(SUM(CAST(round(k * k * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS skk,
               CAST(SUM(CAST(round(v * k * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS svk
        FROM x GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * svk - sv * sk)
                 / (SQRT(n * svv - sv * sv) * SQRT(n * skk - sk * sk)), 6) AS corr_vk
    FROM m
    """,
)
def agg_corr(spark, sf_dir):
    """Pearson correlation of value vs props.k per event type, computed from
    exact scaled moments (not F.corr — its float accumulation order would
    diverge from any oracle), rounded output."""
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.col("value").alias("v"),
        F.get_json_object("props", "$.k").cast("double").alias("k"),
    )

    def ssum(e, scale):
        return F.sum(F.round(e * scale).cast("bigint")).cast("double") / scale

    m = x.groupBy("event_type").agg(
        F.count("*").alias("n"),
        ssum(F.col("v"), 1_000_000).alias("sv"),
        ssum(F.col("k"), 1_000_000).alias("sk"),
        ssum(F.col("v") * F.col("v"), 1_000).alias("svv"),
        ssum(F.col("k") * F.col("k"), 1_000).alias("skk"),
        ssum(F.col("v") * F.col("k"), 1_000).alias("svk"),
    )
    n = F.col("n")
    corr = (n * F.col("svk") - F.col("sv") * F.col("sk")) / (
        F.sqrt(n * F.col("svv") - F.col("sv") * F.col("sv"))
        * F.sqrt(n * F.col("skk") - F.col("sk") * F.col("sk"))
    )
    return m.select("event_type", "n", F.round(corr, 6).alias("corr_vk"))


# Ordered funnel: view -> click -> purchase per user (sequence analytics).
@query(
    "funnel_conversion",
    sql="""
    WITH f AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           (t_view IS NOT NULL) AS did_view,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view) AS did_click_after_view,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
            AND t_purchase IS NOT NULL AND t_purchase >= t_click) AS converted,
           t_view, t_click, t_purchase
    FROM f
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered view->click->purchase funnel per user from first-occurrence
    timestamps — one hash aggregation, no joins or windows."""
    ev = table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    f = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    did_view = F.col("t_view").isNotNull()
    did_click = did_view & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    converted = did_click & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    return f.select(
        "user_id",
        did_view.alias("did_view"),
        did_click.alias("did_click_after_view"),
        converted.alias("converted"),
        "t_view",
        "t_click",
        "t_purchase",
    )


# Cohort retention: first-seen-day cohorts x day offsets.
@query(
    "cohort_retention",
    sql="""
    WITH firstseen AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firstseen f ON e.user_id = f.user_id
    )
    SELECT cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted on
    each later active day — two aggregations and one broadcast join on the
    per-user cohort table."""
    ev = table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(F.broadcast(firstseen), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", F.col("day_offset").cast("bigint").alias("day_offset")).agg(
        F.count("*").alias("n_active_users")
    )


# arg_min/arg_max aggregation as a first-class query.
@query(
    "agg_minmax_by",
    sql="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_minmax_by(spark, sf_dir):
    """max_by/min_by: which order carries the extreme price per status
    (single hash agg; prices are distinct doubles so the argmax is unique)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


# Exact population/sample stddev + variance from scaled moments.
@query(
    "agg_stats",
    sql="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s1,
               CAST(SUM(CAST(round(value * value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS s2
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(s1 / n, 6) AS mean,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_pop,
           ROUND((s2 - s1 * s1 / n) / NULLIF(n - 1, 0), 6) AS var_samp,
           ROUND(SQRT(greatest(s2 / n - (s1 / n) * (s1 / n), 0)), 6) AS stddev_pop
    FROM m
    """,
)
def agg_stats(spark, sf_dir):
    """Mean/variance/stddev (population + sample) from exact scaled moments —
    the deterministic replacement for built-in stddev/var whose float
    accumulation order would diverge from any oracle."""
    ev = table(spark, sf_dir, "events")
    s1 = F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double") / 1_000_000
    s2 = (
        F.sum(F.round(F.col("value") * F.col("value") * 1_000).cast("bigint")).cast("double")
        / 1_000
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), s1.alias("s1"), s2.alias("s2")
    )
    n = F.col("n")
    mean = F.col("s1") / n
    var_pop = F.col("s2") / n - mean * mean
    var_samp = (F.col("s2") - F.col("s1") * F.col("s1") / n) / F.nullif(
        (n - 1), F.lit(0)
    )
    return m.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var_pop, 6).alias("var_pop"),
        F.round(var_samp, 6).alias("var_samp"),
        F.round(F.sqrt(F.greatest(var_pop, F.lit(0.0))), 6).alias("stddev_pop"),
    )


# Join-strategy control: MERGE hint (big-big joins where broadcast is wrong).
@query(
    "join_sortmerge",
    sql=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           {DSUM('l.l_quantity', 'total_qty')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_sortmerge(spark, sf_dir):
    """Fact-to-fact join pinned to sort-merge via hint — the strategy for
    two at-scale tables where neither side broadcasts; both sides shuffle
    once on the key and stream-merge."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "total_qty"))
    )


# Join-strategy control: SHUFFLE_HASH hint (build-side fits per-partition).
@query(
    "join_shufflehash",
    sql=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {DSUM('o.o_totalprice', 'total_price')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_shufflehash(spark, sf_dir):
    """Join pinned to shuffled-hash via hint — avoids the sort when the
    build side fits in memory per partition but is too big to broadcast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


# Bitwise and boolean aggregates.
@query(
    "agg_bitwise",
    sql="""
    SELECT event_type,
           CAST(bit_and(k) AS BIGINT) AS k_and,
           CAST(bit_or(k) AS BIGINT) AS k_or,
           CAST(bit_xor(k) AS BIGINT) AS k_xor,
           bool_and(value > 1) AS all_above_1,
           bool_or(value > 190) AS any_above_190
    FROM (
        SELECT event_type, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    GROUP BY event_type
    """,
)
def agg_bitwise(spark, sf_dir):
    """Bitwise AND/OR/XOR and boolean every/any aggregates per group."""
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return x.groupBy("event_type").agg(
        F.bit_and("k").cast("bigint").alias("k_and"),
        F.bit_or("k").cast("bigint").alias("k_or"),
        F.bit_xor("k").cast("bigint").alias("k_xor"),
        F.bool_and(F.col("value") > 1).alias("all_above_1"),
        F.bool_or(F.col("value") > 190).alias("any_above_190"),
    )


# Ordered string aggregation (listagg/string_agg).
@query(
    "agg_string",
    sql="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string(spark, sf_dir):
    """Ordered string aggregation: sorted collect_list + concat_ws (the
    deterministic listagg form — unordered string_agg is nondeterministic)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count("*").alias("n"),
    )


# Generator source: range() as a table source with computed columns.
@query(
    "source_range",
    sql="""
    SELECT i AS id,
           i * i AS sq,
           CAST(i % 7 AS BIGINT) AS bucket,
           CASE WHEN i % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
    FROM range(10000) t(i)
    """,
)
def source_range(spark, sf_dir):
    """spark.range generator source — distributed synthetic data without a
    file scan (ids partitioned across executors)."""
    return spark.range(10000).select(
        F.col("id"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 7).cast("bigint").alias("bucket"),
        F.when(F.col("id") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("parity"),
    )


# Deterministic sampling: modulo selection (reproducible across engines,
# unlike rand()-based sampling).
@query(
    "sample_mod",
    sql=f"""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id % 10 = 3
    """,
)
def sample_mod(spark, sf_dir):
    """10% deterministic sample by id residue — the reproducible sampling
    pattern for pipeline debugging (rand()-based sampling can't be
    oracle-checked or reproduced across engines)."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 10 == 3).select(
        "event_id", "user_id", "event_type", "value"
    )


# Skewness from exact scaled moments (third standardized moment).
@query(
    "agg_skew",
    sql="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS s1,
               CAST(SUM(CAST(round(value * value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS s2,
               CAST(SUM(CAST(round(value * value * value) AS BIGINT)) AS DOUBLE) AS s3
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(greatest(s2 / n - (s1 / n) * (s1 / n), 1e-12), 1.5), 6) AS skewness
    FROM m
    """,
)
def agg_skew(spark, sf_dir):
    """Population skewness from exact first/second/third scaled moments —
    same deterministic-moments technique as agg_stats/agg_corr."""
    ev = table(spark, sf_dir, "events")
    s1 = F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double") / 1_000_000
    s2 = F.sum(F.round(F.col("value") * F.col("value") * 1_000).cast("bigint")).cast("double") / 1_000
    s3 = F.sum(F.round(F.col("value") * F.col("value") * F.col("value")).cast("bigint")).cast("double")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    n = F.col("n")
    mean = F.col("s1") / n
    var = F.greatest(F.col("s2") / n - mean * mean, F.lit(1e-12))
    m3c = F.col("s3") / n - 3 * mean * (F.col("s2") / n) + 2 * mean * mean * mean
    return m.select(
        "event_type", "n", F.round(m3c / F.pow(var, 1.5), 6).alias("skewness")
    )


# count_if / conditional counting idioms.
@query(
    "agg_countif",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) AS n_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_countif(spark, sf_dir):
    """count_if / FILTER-clause conditional counting."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count("*").alias("n_total"),
    )


# Wide→long reshape (unpivot/melt) + aggregation per measure. Spark's
# native DataFrame.unpivot emits the long form without a join or Python;
# the oracle builds the same long form via UNION ALL.
@query(
    "reshape_unpivot",
    sql=f"""
    WITH long AS (
        SELECT l_returnflag AS flag, 'l_quantity' AS measure,
               l_quantity AS val FROM lineitem
        UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT flag, measure, COUNT(*) AS n, {DSUM('val', 'total_val')}
    FROM long GROUP BY flag, measure
    """,
)
def reshape_unpivot(spark, sf_dir):
    """Unpivot four lineitem measures to long form and aggregate each."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[F.col("l_returnflag").alias("flag")],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("flag", "measure").agg(
        F.count("*").alias("n"), dsum(F.col("val"), "total_val")
    )


# Stratified deterministic sampling: per-stratum rates by id residue —
# the training-data curation pattern (downsample the over-represented
# event types, keep all of the rare ones), reproducible across engines.
@query(
    "sample_stratified",
    sql="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id % 100 < CASE event_type
        WHEN 'view' THEN 10 WHEN 'click' THEN 50 ELSE 100 END
    """,
)
def sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (10% views, 50% clicks, all else)."""
    ev = table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "view", 10)
        .when(F.col("event_type") == "click", 50)
        .otherwise(100)
    )
    return ev.filter((F.col("event_id") % 100) < rate).select(
        "event_id", "user_id", "event_type", "value"
    )


# Deterministic mode (most frequent value) per group: count, then rank with
# a total tiebreak (count desc, value asc) so both engines pick the same
# winner on ties. Spark plans WindowGroupLimit — only the winning row per
# user survives the rank shuffle.
@query(
    "agg_mode",
    sql="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ), r AS (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM c
    )
    SELECT user_id, event_type AS mode_type, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Most frequent event type per user (deterministic tie-break)."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").alias("mode_count"),
        )
    )


# Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match each
# other instead of dropping out — Spark still plans this as a hash-
# partitioned equi-join (not a theta join), so it scales like any other
# shuffle join.
@query(
    "join_nullsafe",
    sql="""
    WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nk
        FROM supplier
    )
    SELECT c.nk AS nk, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    GROUP BY c.nk
    """,
)
def join_nullsafe(spark, sf_dir):
    """Customer-supplier pairing per nation with NULL-matching keys."""
    cu = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    su = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    return (
        cu.join(su, cu["nk"].eqNullSafe(su["nk"]))
        .groupBy(cu["nk"].alias("nk"))
        .agg(F.count("*").alias("n_pairs"))
    )


# Exact weighted average: both the weighted sum and the weight sum
# accumulate as scaled longs (order-independent), so the final division is
# one IEEE op on identical inputs in both engines. The product term uses
# the coarser 1e3 scale — price*quantity*1e3*rows must stay inside the
# int64 budget (see exact.py overflow note).
@query(
    "agg_weighted_avg",
    sql="""
    WITH m AS (
        SELECT l_returnflag AS flag,
               CAST(SUM(CAST(round(l_extendedprice * l_quantity * 1000)
                             AS BIGINT)) AS DOUBLE) / 1000 AS pq,
               CAST(SUM(CAST(round(l_quantity * 1000000)
                             AS BIGINT)) AS DOUBLE) / 1000000 AS q
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, ROUND(pq / q, 6) AS weighted_avg_price, q AS total_qty
    FROM m
    """,
)
def agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average price per returnflag (exact moments)."""
    li = table(spark, sf_dir, "lineitem")

    def ssum(e, scale):
        return F.sum(F.round(e * scale).cast("bigint")).cast("double") / scale

    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        ssum(F.col("l_extendedprice") * F.col("l_quantity"), 1_000).alias("pq"),
        ssum(F.col("l_quantity"), 1_000_000).alias("q"),
    )
    return m.select(
        "flag",
        F.round(F.col("pq") / F.col("q"), 6).alias("weighted_avg_price"),
        F.col("q").alias("total_qty"),
    )


# Shuffle-skew diagnostic: frequency-of-frequencies of the join key. The
# ops query you run BEFORE a big join to decide whether to salt — a skewed
# tail shows up as high rows_per_key entries.
@query(
    "skew_diagnose",
    sql="""
    WITH k AS (
        SELECT l_orderkey, COUNT(*) AS rows_per_key
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT rows_per_key, COUNT(*) AS n_keys
    FROM k GROUP BY rows_per_key
    """,
)
def skew_diagnose(spark, sf_dir):
    """Key-cardinality histogram of lineitem's join key (skew probe)."""
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("rows_per_key"))
    return k.groupBy("rows_per_key").agg(F.count("*").alias("n_keys"))


# Correlated EXISTS subquery through the SQL front end: Catalyst
# decorrelates it into a left-semi hash join (no per-row subquery
# execution), the same physical plan a hand-written semi join gets.
@query(
    "subquery_exists",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_discount > 0.05
    )
    GROUP BY o_orderpriority
    """,
)
def subquery_exists(spark, sf_dir):
    """Orders having any deep-discount line (decorrelated EXISTS)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM v_orders
        WHERE EXISTS (
            SELECT 1 FROM v_lineitem
            WHERE l_orderkey = o_orderkey AND l_discount > 0.05
        )
        GROUP BY o_orderpriority
        """
    )


# HyperLogLog sketches as first-class values (T-B17's scale path): build a
# per-group HLL over user_id, estimate cardinality from the sketch. Unlike
# approx_count_distinct the sketch itself is mergeable — at 100 TB you
# persist sketches per partition/day and fold them with hll_union_agg
# instead of rescanning raw data. Hash-construction specific → rows-only
# (error bound asserted in tests/test_sketch.py).
@query("agg_hll_sketch", sql=None)
def agg_hll_sketch(spark, sf_dir):
    """Mergeable HLL distinct-user sketch per event type, with the exact
    count and error-bound invariant columns (rows-only self-adjudication:
    inv_ok must be true in every row)."""
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    rel_err = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return (
        sk.select(
            "event_type",
            F.hll_sketch_estimate("sketch").alias("approx_users"),
            "exact_users",
        )
        .withColumn("inv_rel_err", F.round(rel_err, 6))
        # default lgConfigK=12 → rsd ~1.6%; 5x headroom
        .withColumn("inv_ok", rel_err <= F.lit(0.08))
    )


# Approximate quantiles via the Greenwald-Khanna sketch (mergeable across
# partitions like any aggregate). Sketch-specific results → rows-only;
# tests/test_sketch.py bounds the error against exact percentiles.
@query("agg_approx_quantile", sql=None)
def agg_approx_quantile(spark, sf_dir):
    """p50/p90/p99 of value per event type from a percentile sketch, with
    rank-error invariant columns: each approx percentile must land inside
    the exact value range of quantiles ±1% around its target (accuracy
    10_000 guarantees ±0.0001 rank error — 100x inside the asserted
    window), so inv_ok is true in every row of a correct sketch."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("qs"),
        F.percentile(
            "value", F.array(*[F.lit(x) for x in (0.49, 0.51, 0.89, 0.91, 0.98, 1.0)])
        ).alias("ex"),
    )
    between = lambda v, lo, hi: (v >= F.col("ex")[lo]) & (v <= F.col("ex")[hi])
    return q.select(
        "event_type",
        F.col("qs")[0].alias("p50"),
        F.col("qs")[1].alias("p90"),
        F.col("qs")[2].alias("p99"),
        (
            between(F.col("qs")[0], 0, 1)
            & between(F.col("qs")[1], 2, 3)
            & between(F.col("qs")[2], 4, 5)
        ).alias("inv_ok"),
    )


# The pure-SQL interface, demonstrated with the iconic TPC-H Q1 pricing
# summary: ONE dialect-neutral SQL text executed VERBATIM by Spark SQL
# (over catalog.register_views temp views) and by the DuckDB oracle — the
# strongest possible parity statement for the SQL surface. Aggregates use
# the scaled-long trick inline (plain-SQL-expressible), so even the
# averages are bit-equal. Catalyst plans the identical partial+final
# hash aggregation it gives the DataFrame API.
_SQL_Q1 = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
               AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS sum_base_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS sum_charge,
           ROUND(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                 / 100 / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE) / 100 / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                 / 100 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("sql_q1", sql=_SQL_Q1)
def sql_q1(spark, sf_dir):
    """TPC-H Q1 via spark.sql over registered views — the SAME SQL text the
    DuckDB oracle runs."""
    from corintick_spark.catalog import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_Q1)


# TPC-H Q3 (shipping priority) through the same verbatim-SQL mechanism:
# two fact joins + aggregation + deterministic top-10 (revenue ties broken
# by orderkey in BOTH engines; o_shippriority omitted — constant in the
# spec and absent from the column-trimmed edge dataset). Catalyst turns the LIMIT into
# TakeOrderedAndProject; the customer join broadcasts.
_SQL_Q3 = """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS DOUBLE) / 10000
               AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query("sql_q3", sql=_SQL_Q3)
def sql_q3(spark, sf_dir):
    """TPC-H Q3 via spark.sql — same text as the oracle."""
    from corintick_spark.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_Q3)


# TPC-H Q5 (local supplier volume): the 6-way star+snowflake join with the
# customer-and-supplier-in-same-nation constraint, one verbatim SQL text.
_SQL_Q5 = """
    SELECT n.n_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS DOUBLE) / 10000
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
"""


@query("sql_q5", sql=_SQL_Q5)
def sql_q5(spark, sf_dir):
    """TPC-H Q5 via spark.sql — same text as the oracle."""
    from corintick_spark.catalog import register_views

    register_views(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier",
        "nation", "region",
    )
    return spark.sql(_SQL_Q5)


# Salted skew join under driver adjudication: the explicit skew-mitigation
# rewrite (operators/joins.py::salted_join — left rows spread over salt
# lanes by a row hash, right rows replicated per lane) must be
# SEMANTICALLY IDENTICAL to the plain equi-join, so its oracle is simply
# the unsalted join's SQL. AQE's skew rule covers sort-merge shuffles it
# can see (SCALING.md §Skew); explicit salting is the tool for the cases
# it can't — skewed keys hidden by compression, or CPU-per-row skew —
# and this query pins that the rewrite never changes results.
@query(
    "join_salted",
    sql="""
    SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_quantity,
           l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def join_salted(spark, sf_dir):
    """Fact-fact equi-join through the 8-lane salted rewrite; result must
    equal the plain join exactly."""
    from corintick_spark.operators.joins import salted_join

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    )
    return salted_join(
        li, o, on="o_orderkey", salt=8, how="inner"
    ).select(
        "o_orderkey", "o_custkey", "l_linenumber", "l_quantity",
        "l_extendedprice",
    )


# Bloom-filter semi-join reduction under driver adjudication: the
# runtime-filter rewrite (operators/bloom.py::bloom_semi_join — dim keys
# folded into a bit set shipped as a plan literal, fact rows prefiltered
# map-side before the verifying semi-join) must be SEMANTICALLY IDENTICAL
# to the plain IN-subquery semi-join, so its oracle is simply that SQL.
# This is the fact ⋈ selective-dim shape where at 100 TB you cannot
# broadcast the dim's rows but CAN broadcast its ~KB bit set; the shuffle
# then carries only probable matches instead of the whole fact table
# (Spark's runtime.bloomFilter rule injects the same plan when it fires —
# this operator is the explicit, always-on form).
@query(
    "join_bloom_prefilter",
    sql=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           {DSUM("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    WHERE l.l_suppkey IN (
        SELECT s.s_suppkey
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Lineitem semi-joined to European suppliers through the Bloom
    prefilter; result must equal the plain semi-join exactly (false
    positives die in the verifying join, false negatives cannot exist)."""
    from corintick_spark.operators.bloom import bloom_semi_join

    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    return (
        bloom_semi_join(li, dim, "l_suppkey", "s_suppkey")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.expr(REVENUE), "revenue"),
        )
        .orderBy("l_returnflag")
    )


# Exact-bitmap join elimination: when the dim key domain is bounded
# integers (dictionary-encoded dims, surrogate keys), the semi-join folds
# to an EXACT bitmap (operators/bloom.py::bitmap_semi_join) and the join
# disappears from the plan entirely — the fact side is one map-side
# filter, zero shuffles for membership, no verifying join (no false
# positives exist). The strongest runtime-filter form; bloom
# (join_bloom_prefilter) is the unbounded-domain fallback. Oracle: the
# plain IN-subquery.
@query(
    "join_bitmap",
    sql=f"""
    SELECT l.l_linestatus,
           COUNT(*) AS n_items,
           {DSUM("l.l_quantity", "sum_qty")}
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def join_bitmap(spark, sf_dir):
    """Lineitem semi-filtered to small parts via the exact bitmap — a
    semi-join with no join operator in the plan."""
    from corintick_spark.operators.bloom import bitmap_semi_join

    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_linestatus", "l_quantity"
    )
    max_key = table(spark, sf_dir, "part").agg(
        F.max("p_partkey")
    ).first()[0]
    return (
        bitmap_semi_join(li, p, "l_partkey", "p_partkey", max_key=max_key)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
        .orderBy("l_linestatus")
    )


# Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
# duplicate multiplicities (min / truncated difference of per-value
# counts), which the plain set forms destroy. Spark plans these as a
# single aggregate-style hash op per side, not a join explosion; the
# oracle is the identical ALL-form SQL. Mixed with a count check so the
# multiplicity arithmetic (not just membership) is adjudicated.
@query(
    "set_ops_all",
    sql="""
    SELECT nationkey, 'intersect_all' AS op, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    UNION ALL
    SELECT nationkey, 'except_all' AS op, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    ORDER BY op, nationkey
    """,
)
def set_ops_all(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL with multiplicity counts per nation."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    inter = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    exc = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return inter.unionByName(exc).select("nationkey", "op", "n").orderBy(
        "op", "nationkey"
    )


# Exact-bitmap ANTI join elimination — the exclusion dual of join_bitmap:
# rows whose key is NOT in the dim fold to a negated map-side bitmap
# probe, no join operator anywhere. Only the EXACT structure supports
# this (a bloom's false positives would silently drop keepers); NULL and
# out-of-domain fact keys are correctly retained per LEFT ANTI semantics.
@query(
    "join_bitmap_anti",
    sql=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           {DSUM("l.l_quantity", "sum_qty")}
    FROM lineitem l
    WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 45)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def join_bitmap_anti(spark, sf_dir):
    """Lineitem excluding large parts via the negated exact bitmap."""
    from corintick_spark.operators.bloom import bitmap_anti_join

    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_quantity"
    )
    max_key = table(spark, sf_dir, "part").agg(F.max("p_partkey")).first()[0]
    return (
        bitmap_anti_join(li, p, "l_partkey", "p_partkey", max_key=max_key)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
        .orderBy("l_returnflag")
    )
