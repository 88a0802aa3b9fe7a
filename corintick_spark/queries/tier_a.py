"""Tier A — the reference's own operator surface (SURVEY.md §2.1).

corintick's entire query model is `read(uid, start, end, columns)` over an
indexed chunk store plus `list_uids` (`api.py::Corintick.read` /
`.list_uids` † — see SURVEY.md §0 for the † convention). Each T-A operator
maps to a declarative DataFrame op whose physical plan Catalyst derives:
predicate pushdown replaces the (uid,start,end) B-tree seek, column pruning
replaces the Mongo projection, parquet row-group stats replace chunk-level
interval filtering.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.exact import dsum, DSUM
from corintick_spark.registry import query


# T-A1/T-A3/T-A5 — indexed scan with key-equality predicate + projection.
@query(
    "scan_filter",
    sql="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE user_id = 7 AND event_type IN ('view', 'click')
    """,
)
def scan_filter(spark, sf_dir):
    """Key-equality scan: corintick read(uid=…) → pushed-down parquet filter
    (api.py::Corintick.read † query doc {uid: X})."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("user_id") == 7) & F.col("event_type").isin("view", "click"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# T-A4/T-A8 — time-interval read: chunk overlap prune + row-level trim are
# one `between` filter in Spark (row-group stats give the chunk prune free).
@query(
    "range_read",
    sql="""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE user_id = 3
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts < TIMESTAMP '2024-01-12 00:00:00'
    """,
)
def range_read(spark, sf_dir):
    """Time-range read for one uid: corintick read(uid, start, end)
    (api.py::Corintick.read † interval-overlap query + final .loc trim)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("user_id") == 3)
            & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .select("event_id", "ts", "event_type", "value")
    )


# T-A5 — column-subset projection (Mongo projection doc → ColumnPruning).
@query(
    "project_subset",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def project_subset(spark, sf_dir):
    """Column projection: corintick read(columns=[...]) fetches only the
    requested column blobs (api.py::Corintick.read † projection doc)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# T-A6 — chunk ordering → global sort by ts.
@query(
    "order_by_ts",
    sql="""
    SELECT event_id, ts, user_id, value
    FROM events
    ORDER BY ts, event_id
    """,
)
def order_by_ts(spark, sf_dir):
    """Time ordering: corintick sorts chunks by `start` before concat
    (api.py::Corintick.read † .sort('start'))."""
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "value").orderBy("ts", "event_id")


# T-A9 — max_docs guard → deterministic top-N (TakeOrderedAndProject).
@query(
    "limit_n",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def limit_n(spark, sf_dir):
    """Bounded read: corintick's max_docs cap (api.py::Corintick.read †),
    as a deterministic ordered limit."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# T-A7 — chunk concat → union-all.
@query(
    "union_all",
    sql="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
    """,
)
def union_all(spark, sf_dir):
    """Union of two reads: corintick pd.concat of chunk frames
    (serialization.py::build_dataframe †)."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type", "value")
    b = ev.filter(F.col("event_type") == "view").select("event_id", "event_type", "value")
    return a.unionByName(b)


# T-A10 — list_uids catalog aggregation.
@query(
    "list_uids",
    sql=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           {DSUM("value", "total_value")}
    FROM events
    GROUP BY user_id
    """,
)
def list_uids(spark, sf_dir):
    """Per-uid catalog stats: corintick list_uids $group pipeline
    (api.py::Corintick.list_uids †) → partial+final hash aggregate."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        dsum("value", "total_value"),
    )


# T-A13 — write-overlap detection as an interval-overlap semi-join.
@query(
    "overlap_semi_join",
    sql="""
    WITH iv AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts, COUNT(*) AS n
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), pw AS (
        SELECT user_id,
               ts - INTERVAL 1 HOUR AS ws,
               ts + INTERVAL 1 HOUR AS we
        FROM events WHERE event_type = 'purchase'
    )
    SELECT iv.user_id, iv.day, iv.start_ts, iv.end_ts, iv.n
    FROM iv
    WHERE EXISTS (
        SELECT 1 FROM pw
        WHERE pw.user_id = iv.user_id
          AND iv.start_ts <= pw.we AND iv.end_ts >= pw.ws
    )
    """,
)
def overlap_semi_join(spark, sf_dir):
    """Interval-overlap semi-join: corintick's write-overlap check
    (api.py::Corintick.write † validation) generalized — which per-uid daily
    extents overlap a ±1h window around any purchase."""
    ev = table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count("*").alias("n"),
    )
    pw = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("we"),
    )
    cond = (
        (iv.user_id == pw.p_user_id)
        & (iv.start_ts <= pw.we)
        & (iv.end_ts >= pw.ws)
    )
    return iv.join(pw, cond, "leftsemi")


# T-A14 — per-uid metadata join (corintick stores arbitrary metadata dicts).
@query(
    "meta_join",
    sql=f"""
    WITH meta AS (
        SELECT i AS user_id, 'tier' || CAST(i % 3 AS VARCHAR) AS tier
        FROM range(200) t(i)
    )
    SELECT e.user_id, m.tier,
           COUNT(*) AS n_events,
           {DSUM("e.value", "total_value")}
    FROM events e JOIN meta m ON e.user_id = m.user_id
    GROUP BY e.user_id, m.tier
    """,
)
def meta_join(spark, sf_dir):
    """Metadata join: corintick's per-document metadata dict
    (api.py::Corintick.write † **metadata) → broadcast KV-table join."""
    ev = table(spark, sf_dir, "events")
    meta = spark.range(200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier"), (F.col("id") % 3).cast("string")).alias("tier"),
    )
    return (
        ev.join(F.broadcast(meta), "user_id")
        .groupBy("user_id", "tier")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )


# T-B5 — projection with computed columns.
@query(
    "project_compute",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
           l_quantity * l_extendedprice AS notional,
           concat(l_returnflag, '/', l_linestatus) AS flag_status
    FROM lineitem
    """,
)
def project_compute(spark, sf_dir):
    """Projection with computed expressions (T-B5) — pure narrow map,
    whole-stage codegen, no shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("gross_price"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("notional"),
        F.concat(
            F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")
        ).alias("flag_status"),
    )


# T-B6 — complex predicate combinations (AND/OR/IN/BETWEEN/NULL/LIKE/RLIKE).
@query(
    "filter_complex",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F') OR o_orderpriority LIKE '1-%')
      AND o_totalprice BETWEEN 50000 AND 400000
      AND o_orderdate IS NOT NULL
      AND regexp_matches(o_orderpriority, '^[1-3]-')
    """,
)
def filter_complex(spark, sf_dir):
    """Conjunctive/disjunctive predicates with IN, BETWEEN, LIKE, RLIKE,
    IS NOT NULL (T-B6) — all pushed toward the scan by Catalyst."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("O", "F") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(50000, 400000)
        & F.col("o_orderdate").isNotNull()
        & F.col("o_orderpriority").rlike("^[1-3]-")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
