"""Tier B scalar function surface — T-B32..B38 (SURVEY.md §2.2).

All JVM-side built-ins (whole-stage codegen, no Python in the hot path).
Cross-engine determinism notes: computed integers are cast to BIGINT on both
sides (Spark size()/year() return int32, DuckDB len()/year() return int64);
transcendental results are rounded to 6 decimals (JVM vs libm may differ in
the last ulp); plain +,-,*,/ and sqrt are IEEE-exact and left unrounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.registry import query


# T-B32 — string functions.
@query(
    "scalar_string",
    sql="""
    SELECT doc_id,
           lower(substr(text, 1, 20)) AS head,
           upper(lang) AS lang_uc,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
           concat(COALESCE(lang, ''), '-', COALESCE(source, '')) AS lang_source,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    """,
)
def scalar_string(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head"),
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("bigint").alias("n_chars_calc"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("bigint").alias("n_nonspace"),
        # explicit coalesce: Spark's concat NULLs the whole result on any
        # NULL arg while DuckDB's skips them — pin one semantic in both
        F.concat(
            F.coalesce(F.col("lang"), F.lit("")),
            F.lit("-"),
            F.coalesce(F.col("source"), F.lit("")),
        ).alias("lang_source"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.when(F.col("text").like("%spark%"), F.lit(1)).otherwise(F.lit(0)).alias("mentions_spark"),
    )


# T-B33 — date/time functions.
@query(
    "scalar_date",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           o_orderdate + INTERVAL 90 DAY AS due_date
    FROM orders
    """,
)
def scalar_date(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


# T-B34 — math functions.
@query(
    "scalar_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.1, 4) AS fee,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           l_quantity * l_quantity AS qty_sq,
           round(ln(1 + l_extendedprice), 6) AS log_price,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def scalar_math(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.1, 4).alias("fee"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.log(F.lit(1) + F.col("l_extendedprice")), 6).alias("log_price"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


# T-B35 — array higher-order functions over the embedding column.
@query(
    "scalar_array",
    sql="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round((SELECT SUM(x*x) FROM UNNEST(CAST(embedding AS DOUBLE[])) t(x)), 6) AS norm_sq,
           round((SELECT SUM(x) FROM UNNEST(CAST(embedding AS DOUBLE[])) t(x)) / len(embedding), 6) AS avg_pool,
           CAST(embedding[1] AS DOUBLE) AS first_comp,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def scalar_array(spark, sf_dir):
    """Vector ops as columns (T-B51): norm, avg-pool, filter — all JVM-side
    higher-order functions, no UDF."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)"),
            6,
        ).alias("norm_sq"),
        F.round(
            F.expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)")
            / F.size("embedding"),
            6,
        ).alias("avg_pool"),
        F.element_at(dbl, 1).alias("first_comp"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


# T-B36 — map functions (map built in-flight; oracle checks the extracted
# scalars, the portable part of map semantics).
@query(
    "scalar_map",
    sql="""
    SELECT event_id,
           value AS base,
           value * 2 AS doubled,
           CAST(2 AS BIGINT) AS n_keys
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scalar_map(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("base"), F.col("value"), F.lit("doubled"), F.col("value") * 2
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("m", m)
        .select(
            "event_id",
            F.element_at(F.col("m"), "base").alias("base"),
            F.element_at(F.col("m"), "doubled").alias("doubled"),
            F.size(F.map_keys(F.col("m"))).cast("bigint").alias("n_keys"),
        )
    )


# T-B37 — JSON extraction from events.props.
@query(
    "scalar_json",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def scalar_json(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_bucket"),
    )


# T-B38 — conditional expressions.
@query(
    "scalar_cond",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'hi'
                WHEN l_discount > 0.02 THEN 'mid'
                ELSE 'lo' END AS disc_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS is_bulk
    FROM lineitem
    """,
)
def scalar_cond(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, F.lit("hi"))
        .when(F.col("l_discount") > 0.02, F.lit("mid"))
        .otherwise(F.lit("lo"))
        .alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.when(F.col("l_quantity") > 25, F.lit(1)).otherwise(F.lit(0)).alias("is_bulk"),
    )


# Binary functions: encode/hash/base64/hex round-trips.
@query(
    "scalar_binary",
    sql="""
    SELECT doc_id,
           base64(encode(substr(text, 1, 30))) AS b64_head,
           hex(encode(substr(text, 1, 8))) AS hex_head,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS md5_hex
    FROM documents
    """,
)
def scalar_binary(spark, sf_dir):
    """Binary column functions: utf-8 encode, base64/hex representations,
    byte length, md5 — the opaque-payload manipulation surface."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 30), "utf-8")).alias("b64_head"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("hex_head"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
        F.md5(F.encode(F.col("text"), "utf-8")).alias("md5_hex"),
    )


# Struct column operations (completes the array/map/struct nested-type trio).
@query(
    "scalar_struct",
    sql="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_totalprice AS price,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           concat(o_orderstatus, ':', o_orderpriority) AS status_priority
    FROM orders
    """,
)
def scalar_struct(spark, sf_dir):
    """Build a struct column, operate on it, project fields back out — the
    oracle checks the flattened fields (struct layout is engine-internal)."""
    o = table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("odate"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        o.withColumn("ostruct", s)
        .select(
            "o_orderkey",
            F.col("ostruct.status").alias("status"),
            F.col("ostruct.price").alias("price"),
            F.year(F.col("ostruct.odate")).cast("bigint").alias("yr"),
            F.concat(
                F.col("ostruct.status"), F.lit(":"), F.col("ostruct.priority")
            ).alias("status_priority"),
        )
    )


# Null-handling functions: nullif/coalesce/nvl2/null-safe equality.
@query(
    "scalar_null",
    sql="""
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1,
           (nullif(l_discount, 0.0) IS NOT DISTINCT FROM NULL) AS is_zero_disc,
           CASE WHEN nullif(l_tax, 0.0) IS NULL THEN 'no_tax' ELSE 'taxed' END AS tax_band,
           (nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)) AS disc_eq_tax_nullsafe
    FROM lineitem
    """,
)
def scalar_null(spark, sf_dir):
    """Null-handling surface: nullif, coalesce, IS NULL branches, null-safe
    equality (<=> vs IS NOT DISTINCT FROM)."""
    li = table(spark, sf_dir, "lineitem")
    d0 = F.nullif(F.col("l_discount"), F.lit(0.0))
    t0 = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d0.alias("disc_or_null"),
        F.coalesce(d0, F.lit(-1.0)).alias("disc_or_neg1"),
        d0.eqNullSafe(F.lit(None).cast("double")).alias("is_zero_disc"),
        F.when(t0.isNull(), F.lit("no_tax")).otherwise(F.lit("taxed")).alias("tax_band"),
        d0.eqNullSafe(t0).alias("disc_eq_tax_nullsafe"),
    )


# Trigonometric / inverse-trig functions (rounded: libm vs JVM last-ulp).
@query(
    "scalar_trig",
    sql="""
    SELECT event_id,
           ROUND(SIN(value / 100), 6) AS sin_v,
           ROUND(COS(value / 100), 6) AS cos_v,
           ROUND(ATAN2(value, 100), 6) AS atan2_v,
           ROUND(DEGREES(ATAN(value / 100)), 6) AS angle_deg
    FROM events
    """,
)
def scalar_trig(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    v = F.col("value") / 100
    return ev.select(
        "event_id",
        F.round(F.sin(v), 6).alias("sin_v"),
        F.round(F.cos(v), 6).alias("cos_v"),
        F.round(F.atan2(F.col("value"), F.lit(100.0)), 6).alias("atan2_v"),
        F.round(F.degrees(F.atan(v)), 6).alias("angle_deg"),
    )


# String shaping: pad/repeat/reverse/translate/initcap.
@query(
    "scalar_pad",
    sql="""
    SELECT n_nationkey,
           lpad(n_name, 15, '.') AS name_lpad,
           rpad(n_name, 15, '_') AS name_rpad,
           reverse(n_name) AS name_rev,
           repeat('-', CAST(n_nationkey % 5 AS INT)) AS dashes,
           translate(n_name, '_', ' ') AS name_spaced
    FROM nation
    """,
)
def scalar_pad(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad("n_name", 15, ".").alias("name_lpad"),
        F.rpad("n_name", 15, "_").alias("name_rpad"),
        F.reverse("n_name").alias("name_rev"),
        F.repeat(F.lit("-"), (F.col("n_nationkey") % 5).cast("int")).alias("dashes"),
        F.translate("n_name", "_", " ").alias("name_spaced"),
    )


# Timezone conversion — the exchange-local-time operation tick data needs
# (naive wall time in a named zone -> absolute UTC instant, DST-aware).
# Engine-parity notes:
# - results compare as ABSOLUTE epoch microseconds (Spark
#   unix_micros(to_utc_timestamp(ts, tz)) == DuckDB
#   epoch_us(timezone(tz, ts))) — a TIMESTAMPTZ->naive cast would depend
#   on the oracle session's TZ setting;
# - local times WITHOUT a unique interpretation are excluded by contract:
#   at the fall-back overlap Spark (JSR-310) resolves to the EARLIER
#   offset and ICU to the LATER one (found by the edge dataset's
#   2024-11-03 01:30 America/New_York row), and nonexistent spring-forward
#   times are shifted engine-specifically. The uniqueness predicate is the
#   portable roundtrip pair below: ts is kept iff converting back yields
#   ts and neither utc±1h does (i.e. exactly one valid offset).
# The derived offset column makes the DST transition visible (-240 summer
# / -300 winter for New York).
@query(
    "scalar_timezone",
    sql="""
    WITH conv AS (
        SELECT event_id, ts,
               timezone('America/New_York', ts) AS ny_utc,
               timezone('Asia/Tokyo', ts) AS tokyo_utc
        FROM events
    )
    SELECT event_id, ts,
           CAST(epoch_us(ny_utc) AS BIGINT) AS ny_utc_us,
           CAST(epoch_us(tokyo_utc) AS BIGINT) AS tokyo_utc_us,
           CAST((epoch_us(ts) - epoch_us(ny_utc)) / 60000000 AS BIGINT)
               AS ny_offset_min
    FROM conv
    WHERE timezone('America/New_York', ny_utc) = ts
      AND timezone('America/New_York', ny_utc + INTERVAL 1 HOUR) <> ts
      AND timezone('America/New_York', ny_utc - INTERVAL 1 HOUR) <> ts
    """,
)
def scalar_timezone(spark, sf_dir):
    """Events' wall time interpreted as New York / Tokyo local, as absolute
    UTC epoch micros + the DST-aware NY offset; ambiguous/nonexistent
    local instants excluded (unique-interpretation contract)."""
    ev = table(spark, sf_dir, "events")
    z = "America/New_York"
    ny = F.to_utc_timestamp("ts", z)
    back = F.from_utc_timestamp(ny, z)
    back_p1 = F.from_utc_timestamp(ny + F.expr("INTERVAL 1 HOUR"), z)
    back_m1 = F.from_utc_timestamp(ny - F.expr("INTERVAL 1 HOUR"), z)
    tokyo = F.unix_micros(F.to_utc_timestamp("ts", "Asia/Tokyo"))
    return (
        ev.filter(
            (back == F.col("ts"))
            & (back_p1 != F.col("ts"))
            & (back_m1 != F.col("ts"))
        )
        .select(
            "event_id",
            "ts",
            F.unix_micros(ny).alias("ny_utc_us"),
            tokyo.alias("tokyo_utc_us"),
            ((F.unix_micros("ts") - F.unix_micros(ny)) / 60_000_000)
            .cast("bigint")
            .alias("ny_offset_min"),
        )
    )


# Spark 4 VARIANT — the binary semi-structured type (SPARK-45891): JSON is
# parsed ONCE into a typed binary encoding and every subsequent path
# extraction is a cheap binary probe, not a re-parse; at 100 TB this (plus
# shredded storage) is the difference between scanning JSON text per
# predicate and columnar-style access into semi-structured blobs. The
# query builds a nested document per event in-plan, parses it to VARIANT,
# and extracts typed paths + the inferred schema; the DuckDB oracle runs
# the same construction through its JSON type. Only integers/strings cross
# the JSON boundary (float text formatting is engine-specific).
@query(
    "scalar_variant",
    sql="""
    WITH j AS (
        SELECT event_id,
               json_object(
                   'uid', user_id,
                   'kind', event_type,
                   'meta', json_object(
                       'k', CAST(json_extract_string(props, '$.k') AS BIGINT),
                       'hour', CAST(EXTRACT(HOUR FROM ts) AS BIGINT)
                   )
               ) AS v
        FROM events
        WHERE props IS NOT NULL
    )
    SELECT event_id,
           CAST(json_extract(v, '$.uid') AS BIGINT) AS uid,
           json_extract_string(v, '$.kind') AS kind,
           CAST(json_extract(v, '$.meta.k') AS BIGINT) AS meta_k,
           CAST(json_extract(v, '$.meta.hour') AS BIGINT) AS meta_hour,
           CAST(json_extract(v, '$.meta.k') AS BIGINT) % 7 AS k_mod,
           CAST(json_extract(v, '$.missing') AS BIGINT) AS absent
    FROM j
    WHERE json_extract_string(v, '$.kind') <> 'view'
    """,
)
def scalar_variant(spark, sf_dir):
    """Typed path extraction from a VARIANT column built in-plan; missing
    paths null-propagate via try_variant_get."""
    from corintick_spark.catalog import normalize_event_time

    ev = normalize_event_time(table(spark, sf_dir, "events")).filter(
        F.col("props").isNotNull()
    )
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("kind"),
            F.struct(
                F.get_json_object("props", "$.k").cast("bigint").alias("k"),
                F.hour("ts").cast("bigint").alias("hour"),
            ).alias("meta"),
        )
    )
    v = F.parse_json(doc)
    get = lambda path, t: F.try_variant_get(v, path, t)  # noqa: E731
    return (
        ev.select(
            "event_id",
            get("$.uid", "bigint").alias("uid"),
            get("$.kind", "string").alias("kind"),
            get("$.meta.k", "bigint").alias("meta_k"),
            get("$.meta.hour", "bigint").alias("meta_hour"),
            (get("$.meta.k", "bigint") % 7).alias("k_mod"),
            get("$.missing", "bigint").alias("absent"),
        )
        .filter(F.col("kind") != "view")
    )
