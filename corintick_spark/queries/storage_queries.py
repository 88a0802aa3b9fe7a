"""Storage round-trip queries — T-A2/T-B2/T-B3 (SURVEY.md §2).

The reference's core guarantee is the write→read round-trip
(tests/test_corintick.py † writes a frame, reads it back, asserts equality —
SURVEY.md §5). Here: write a derived frame through TickStore's partitioned
parquet path, read it back with uid/range/column pruning, and let the DuckDB
oracle recompute the same result from the source table — proving the store
is lossless AND the read path filters correctly.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from corintick_spark.catalog import table
from corintick_spark.registry import query
from corintick_spark.storage import TickStore


@query(
    "write_roundtrip",
    sql="""
    SELECT CAST(user_id AS VARCHAR) AS uid,
           date_trunc('hour', ts) AS ts,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           COUNT(*) AS volume
    FROM events
    WHERE user_id IN (1, 2, 3)
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def write_roundtrip(spark, sf_dir):
    """Chunked write + indexed read-back (api.py::Corintick.write/read †):
    derive hourly OHLC bars per uid from events, write via TickStore
    (partitionBy uid, sortWithinPartitions ts), read back a uid subset with
    column pruning, compare against recomputing from source."""
    ev = table(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    bars = (
        ev.groupBy(
            F.col("user_id").cast("string").alias("uid"),
            F.date_trunc("hour", F.col("ts")).alias("ts"),
        )
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count("*").alias("volume"),
        )
    )
    root = tempfile.mkdtemp(prefix="tickstore_rt_")
    store = TickStore(spark, root)
    store.write(bars, mode="overwrite")
    out = store.read(uids=["1", "2", "3"], columns=["open", "high", "low", "close", "volume"])
    # partition column comes back as the partition directory's string value
    return out.select(
        F.col("uid").cast("string").alias("uid"),
        "ts",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@query(
    "ingest_json",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS total_value,
           MIN(CAST(epoch_us(ts) AS BIGINT)) AS first_us
    FROM events
    GROUP BY event_type
    """,
)
def ingest_json(spark, sf_dir):
    """JSON ingestion (T-B2): export events to JSON lines, re-read with an
    explicit schema (schema-on-read — no inference pass at scale), aggregate.
    Proves the text-source path is lossless for the carried columns."""
    ev = table(spark, sf_dir, "events")
    out_dir = os.path.join(tempfile.mkdtemp(prefix="ingest_json_"), "events_json")
    (
        ev.select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .json(out_dir)
    )
    back = spark.read.schema(
        "event_id long, ts_us long, user_id long, event_type string, value double"
    ).json(out_dir)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double") / 1_000_000).alias("total_value"),
        F.min("ts_us").alias("first_us"),
    )


@query(
    "ingest_csv",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def ingest_csv(spark, sf_dir):
    """CSV ingestion (T-B2): export orders to CSV, re-read with an explicit
    schema + header, aggregate — proves the text-source path round-trips."""
    o = table(spark, sf_dir, "orders")
    out_dir = os.path.join(tempfile.mkdtemp(prefix="ingest_csv_"), "orders_csv")
    (
        o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out_dir)
    )
    back = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
        )
        .option("header", "true")
        .csv(out_dir)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("bigint")).cast("double") / 1_000_000).alias("total"),
    )


@query(
    "ingest_orc",
    sql="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def ingest_orc(spark, sf_dir):
    """ORC ingestion (T-B2's third format): export customer to ORC, re-read,
    aggregate — Spark bundles the ORC datasource, so the columnar round-trip
    needs no extra packages."""
    c = table(spark, sf_dir, "customer")
    out_dir = os.path.join(tempfile.mkdtemp(prefix="ingest_orc_"), "customer_orc")
    c.select("c_custkey", "c_mktsegment", "c_acctbal").write.mode(
        "overwrite"
    ).orc(out_dir)
    back = spark.read.orc(out_dir)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("c_acctbal") * 1_000_000).cast("bigint")).cast("double") / 1_000_000).alias("total_bal"),
    )


@query(
    "source_python_ds",
    sql="""
    WITH t AS (
        SELECT i % 50 AS uid,
               ((i * 2654435761) % 1000003) / 1000.0 AS value
        FROM range(10000) r(i)
    )
    SELECT uid, COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM t GROUP BY uid
    """,
)
def source_python_ds(spark, sf_dir):
    """Custom Python DataSource (PySpark 4 API): read the deterministic
    tick generator (sources/tick_source.py) and aggregate — proves the
    source-extensibility path end to end, partitions and all."""
    from corintick_spark.catalog import _ship_package
    from corintick_spark.sources.tick_source import TickDataSource

    # The datasource class is pickled by reference into the Python worker;
    # ship the package so a vanilla (driver-built) session resolves it.
    _ship_package(spark)
    try:
        spark.dataSource.register(TickDataSource)
    except Exception as e:
        # Re-registering the same name is the only benign failure; anything
        # else (pickling error, bad class) must propagate — swallowing it
        # just moves the failure to a less diagnosable spot at read time.
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise
    df = (
        spark.read.format("pyticks")
        .option("rows", 10000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("uid").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double") / 1_000_000).alias("total_value"),
    )


@query(
    "join_bucketed",
    sql="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(l.l_extendedprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed(spark, sf_dir):
    """Co-located join via bucketed tables (operators/joins.py): both sides
    bucketed+sorted on orderkey at write time, so the join needs NO
    exchange — the pre-shuffle trade every repeated 100 TB fact-fact join
    should make. Values must equal the plain shuffle join (the oracle)."""
    import tempfile

    from corintick_spark.operators.joins import write_bucketed

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    base = tempfile.mkdtemp(prefix="bucketed_join_")
    write_bucketed(li, "bj_lineitem", f"{base}/li", "l_orderkey", 8)
    write_bucketed(o, "bj_orders", f"{base}/o", "o_orderkey", 8)
    lb, ob = spark.table("bj_lineitem"), spark.table("bj_orders")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("l_extendedprice") * 1_000_000).cast("bigint")).cast("double") / 1_000_000).alias("total_price"),
        )
    )


# Custom Python STREAMING data source (PySpark 4 SimpleDataSourceStreamReader)
# — the streaming twin of source_python_ds: the tick generator replayed as
# 5 offset-tracked micro-batches (1000 rows each) through a complete-mode
# aggregation. Offsets are row indices; readBetweenOffsets makes any batch
# range replayable for exactly-once recovery; the exhausted source stops
# advancing its offset, which is what lets processAllAvailable() terminate.
@query(
    "source_python_stream",
    sql=f"""
    WITH t AS (
        SELECT i % 50 AS uid,
               ((i * 2654435761) % 1000003) / 1000.0 AS value
        FROM range(5000) r(i)
    )
    SELECT uid, COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM t GROUP BY uid
    """,
)
def source_python_stream(spark, sf_dir):
    """Python streaming DataSource: 5 offset-tracked micro-batches of the
    deterministic tick generator, aggregated in complete mode."""
    from corintick_spark.sources.tick_source import make_stream_datasource
    from corintick_spark.streaming.events_stream import run_processall_to_memory

    # closure-built class: pickles BY VALUE into the driver-side streaming
    # source runner, which (unlike executor workers) never sees addPyFile
    try:
        spark.dataSource.register(make_stream_datasource())
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise
    src = (
        spark.readStream.format("pyticks_stream")
        .option("rows", 5000)
        .option("batchRows", 1000)
        .load()
    )
    agg = src.groupBy("uid").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double")
            / 1_000_000
        ).alias("total_value"),
    )
    return run_processall_to_memory(agg, spark)


@query(
    "sink_roundtrip",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM events
    WHERE user_id < 20
    GROUP BY event_type
    """,
)
def sink_roundtrip(spark, sf_dir):
    """Custom Python data SINK round-trip (PySpark 4 DataSourceArrowWriter,
    sources/arrow_sink.py): push an events slice through the Arrow-IPC
    two-phase-commit sink, read the committed files back with pyarrow, and
    aggregate — the oracle recomputes from the source table, proving the
    sink is lossless and commits exactly once."""
    import tempfile as _tf

    from corintick_spark.sources.arrow_sink import read_back, register

    register(spark)
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    path = _tf.mkdtemp(prefix="arrow_sink_rt_")
    (
        ev.select("event_id", "event_type", "value")
        .write.format("arrowsink")
        .option("path", path)
        .mode("overwrite")
        .save()
    )
    t = read_back(path)
    back = spark.createDataFrame(t.to_pandas())
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            .cast("double") / 1_000_000
        ).alias("total_value"),
    )


@query(
    "sink_stream_python",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '1970-01-01' AND user_id < 20
    GROUP BY event_type
    """,
)
def sink_stream_python(spark, sf_dir):
    """Custom Python STREAMING sink round-trip (PySpark 4
    DataSourceStreamWriter, sources/stream_sink.py): replay events as 3
    chronological micro-batches through the epoch-manifest JSON-lines
    sink, read back ONLY manifest-committed rows, and aggregate — the
    oracle recomputes from the source table, proving the sink commits
    each epoch exactly once and loses nothing across epochs."""
    import tempfile as _tf

    from corintick_spark.sources.stream_sink import (
        committed_epochs,
        read_back,
        register as register_sink,
    )
    from corintick_spark.streaming.events_stream import events_stream_batched

    register_sink(spark)
    src = events_stream_batched(spark, sf_dir, n_batches=3).filter(
        F.col("user_id") < 20
    ).select("event_id", "event_type", "value")
    path = _tf.mkdtemp(prefix="jsonl_sink_rt_")
    ckpt = _tf.mkdtemp(prefix="jsonl_sink_ckpt_")
    q = (
        src.writeStream.format("jsonlsink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(committed_epochs(path)) >= 1
    rows = read_back(path)
    back = spark.createDataFrame(
        [(r["event_id"], r["event_type"], r["value"]) for r in rows],
        "event_id long, event_type string, value double",
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            .cast("double") / 1_000_000
        ).alias("total_value"),
    )


# Snapshot isolation + time travel (corintick_spark/snapshots.py — the
# versioned-manifest table layer): v0 commits one doc split, v1 appends a
# second, then a COMPACTION commits v2 rewriting the file set. The query
# reads version 0 by time travel and the post-compaction latest, emitting
# per-version row counts and an exact integer aggregate — equal to the
# oracle's direct split sums ONLY if manifest gating, time travel, and
# compaction row-preservation all work.
@query(
    "storage_snapshot",
    sql="""
    SELECT CAST(0 AS BIGINT) AS version,
           COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           COUNT(*),
           CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 3 IN (0, 1)
    ORDER BY version
    """,
)
def storage_snapshot(spark, sf_dir):
    """Versioned-manifest store: append / append / compact, then time-travel
    read v0 and snapshot-read the compacted latest."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapstore_") + "/tbl")
    store.append(d.filter(F.col("doc_id") % 3 == 0))
    store.append(d.filter(F.col("doc_id") % 3 == 1))
    store.compact(target_partitions=2)

    def stats(df, version):
        return df.agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count("*").alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )

    # v0 by time travel; the latest (v2, post-compaction) must equal v1
    return stats(store.read(version=0), 0).unionByName(
        stats(store.read(), 1)
    ).orderBy("version")


# MERGE upsert on the versioned-manifest store (snapshots.py::merge): v0
# holds the even-doc_id split; the source carries every doc_id % 3 == 0 row
# with n_chars shifted by +1000 — doc_id % 6 == 0 rows are UPDATES, the
# rest of the source INSERTS, and odd-untouched rows must survive the
# copy-on-write rewrite. The oracle recomputes MERGE semantics relationally
# (matched-replace UNION unmatched-keep). Wrong if key matching, the
# anti-join, file carry-forward, or stats-based pruning drops/duplicates
# anything.
@query(
    "storage_merge",
    sql="""
    SELECT doc_id, CAST(n_chars + 1000 AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0 AND doc_id % 3 != 0
    """,
)
def storage_merge(spark, sf_dir):
    """SCD-1 MERGE on SnapshotStore: upsert a +1000-shifted doc_id%3 source
    into the doc_id%2 base, read the merged latest version."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapmerge_") + "/tbl")
    store.append(d.filter(F.col("doc_id") % 2 == 0))
    source = d.filter(F.col("doc_id") % 3 == 0).withColumn(
        "n_chars", F.col("n_chars") + F.lit(1000)
    )
    store.merge(source, key="doc_id")
    return store.read()


# Change data feed between snapshot versions (snapshots.py::changes): after
# the same MERGE as storage_merge, changes(v0, v1) must emit exactly the
# source rows as inserts and the pre-image of the matched (doc_id % 6 == 0)
# rows as deletes — rows of rewritten files that did NOT change must cancel
# in the row-level reconciliation, and carried files must not appear at all.
@query(
    "storage_cdf",
    sql="""
    SELECT doc_id, CAST(n_chars + 1000 AS BIGINT) AS n_chars,
           'insert' AS change_type
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           'delete' AS change_type
    FROM documents WHERE doc_id % 6 = 0
    """,
)
def storage_cdf(spark, sf_dir):
    """Row-level change feed across a MERGE commit: inserts = source rows,
    deletes = replaced pre-images, rewrite-survivor rows cancel out."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapcdf_") + "/tbl")
    v0 = store.append(d.filter(F.col("doc_id") % 2 == 0))
    source = d.filter(F.col("doc_id") % 3 == 0).withColumn(
        "n_chars", F.col("n_chars") + F.lit(1000)
    )
    v1 = store.merge(source, key="doc_id")
    return store.changes(v0, v1)


# Copy-on-write DELETE (snapshots.py::delete_where): rows matching the
# predicate vanish from the new version while time travel still sees them;
# the oracle recomputes the surviving set directly. (Stats-based file
# pruning for deletes is pinned by tests/test_snapshots.py — at this scale
# every file overlaps the predicate.)
@query(
    "storage_delete",
    sql="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE doc_id % 2 = 0 AND n_chars % 7 != 0
    """,
)
def storage_delete(spark, sf_dir):
    """DELETE WHERE on SnapshotStore: drop n_chars%7==0 rows from the
    even-doc_id table, read the post-delete version."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapdel_") + "/tbl")
    store.append(d.filter(F.col("doc_id") % 2 == 0))
    store.delete_where("n_chars % 7 = 0")
    return store.read()


# Stats-pruned read (snapshots.py::read_where): the manifest's per-file
# [min, max] bounds skip disjoint files BEFORE any scan — manifest-level
# file skipping, the layer above parquet row-group pruning. The store is
# range-partitioned on doc_id so the bounds are tight; the residual filter
# keeps the result exact however coarse they are. That actual files are
# skipped is pinned by tests/test_snapshots.py (prune_files); the oracle
# adjudicates only the visible contract: read_where == BETWEEN.
@query(
    "storage_pruned_read",
    sql="""
    SELECT doc_id, n_chars, lang
    FROM documents
    WHERE doc_id BETWEEN 100 AND 299
    """,
)
def storage_pruned_read(spark, sf_dir):
    """read_where over a range-clustered snapshot: files outside
    [100, 299] on doc_id never open."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapprune_") + "/tbl")
    store.append(d.repartitionByRange(8, "doc_id"))
    return store.read_where("doc_id", 100, 299)


# OPTIMIZE ZORDER (snapshots.py::cluster_by): rewrite the table clustered
# on the Morton curve of (doc_id, n_chars) so read_where prunes on EITHER
# column. The clustering is a pure rewrite — result-invisible — so the
# oracle is the plain BETWEEN on the SECOND z-column, the one a doc_id
# range layout could never skip files for. Improved pruning on that
# column is pinned by tests/test_snapshots.py.
@query(
    "storage_zorder",
    sql="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE n_chars BETWEEN 500 AND 999
    """,
)
def storage_zorder(spark, sf_dir):
    """Z-order cluster on (doc_id, n_chars), then a stats-pruned read on
    n_chars — the non-leading dimension."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapz_") + "/tbl")
    store.append(d.repartitionByRange(8, "doc_id"))
    store.cluster_by(["doc_id", "n_chars"], target_files=8)
    return store.read_where("n_chars", 500, 999)


# Incremental view maintenance (snapshots.py::refresh_aggregate): a
# per-lang COUNT/SUM aggregate materialized at v0 is refreshed from the
# v0→v1 change data feed alone — the base table is never rescanned (the
# CDF reads only delta files; the update's delete+insert pair is what
# makes SUM/COUNT sign-refreshable). The oracle recomputes the aggregate
# of the FINAL table state from scratch, so the driver adjudicates
# incremental == full recompute.
@query(
    "storage_ivm",
    sql="""
    WITH final AS (
      SELECT doc_id, lang, n_chars + 1000 AS n_chars
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, lang, n_chars
      FROM documents WHERE doc_id % 2 = 0 AND doc_id % 3 != 0
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM final GROUP BY lang ORDER BY lang
    """,
)
def storage_ivm(spark, sf_dir):
    """Materialize per-lang stats at v0, MERGE a +1000-chars source, then
    refresh the aggregate from the change feed only."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore, refresh_aggregate

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapivm_") + "/tbl")
    v0 = store.append(d.filter(F.col("doc_id") % 2 == 0))
    agg0 = (
        store.read(version=v0)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        )
    )
    source = d.filter(F.col("doc_id") % 3 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    v1 = store.merge(source, key="doc_id")
    delta = store.changes(v0, v1)
    return refresh_aggregate(
        agg0, delta, ["lang"], {"n_chars": "sum_chars"}, count_col="n_docs"
    ).orderBy("lang")


# Dynamic partition pruning, Catalyst-native: the fact table is laid out
# partitioned-by event_type; the pruning key set is only known at RUNTIME
# (event types that ever saw a value > 99.5), so static pruning can't
# fire — Catalyst injects the dim side as a dynamicpruning# subquery into
# the fact scan's PartitionFilters and whole partitions are never listed.
# tests/test_plans.py pins `dynamicpruning` in the scan; the oracle is
# the plain join. This is the partition-level sibling of the row-level
# runtime filters (join_bloom_prefilter / join_bitmap).
@query(
    "join_dpp",
    sql="""
    SELECT e.event_type, COUNT(*) AS n
    FROM events e
    WHERE e.event_type IN (
        SELECT DISTINCT event_type FROM events WHERE value > 99.5
    )
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def join_dpp(spark, sf_dir):
    """Partition-pruned fact join: the partition filter is a runtime
    subquery, not a constant."""
    import tempfile as _tf

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    d = _tf.mkdtemp(prefix="dpp_") + "/ev"
    ev.write.partitionBy("event_type").parquet(d)
    part_ev = spark.read.parquet(d)
    dim = ev.filter(F.col("value") > 99.5).select("event_type").distinct()
    return (
        part_ev.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


# Per-file Bloom index (snapshots.py::index_bloom/read_where_eq): point
# lookup on a column the layout is NOT clustered by — the store is
# hash-scattered on doc_id, so every file spans the full id range and
# min/max bounds skip nothing; the per-file Bloom filters recorded in the
# manifest do (Delta/Parquet bloom-index shape; actual file skipping is
# pinned by tests/test_snapshots.py). The residual equality filter keeps
# the result exact whatever the filter's FP rate; the probe literal is
# cast to the column's recorded type because xxhash64 is type-sensitive.
@query(
    "storage_bloom_lookup",
    sql="""
    SELECT doc_id, n_chars, lang
    FROM documents WHERE doc_id = 321
    """,
)
def storage_bloom_lookup(spark, sf_dir):
    """Point lookup through the manifest's per-file Bloom index."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapbloom_") + "/tbl")
    store.append(d.repartition(8, "doc_id"))
    store.index_bloom(["doc_id"], num_bits=1 << 13)
    return store.read_where_eq("doc_id", 321)


# Streaming FROM the snapshot store (sources/cdf_source.py): each
# committed version replays as one micro-batch — offsets ARE version
# numbers, re-readable from the immutable manifests (exactly-once replay
# for free). The table written by batch/stream ingestion becomes a stream
# source itself, closing the lakehouse loop: write → version → stream.
# Append-only contract enforced (a file-removing version raises — Delta's
# skipChangeCommits shape; batch changes() is the full-CDC path).
@query(
    "stream_cdf_source",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_cdf_source(spark, sf_dir):
    """3 appended versions streamed back as 3 micro-batches through a
    complete-mode aggregation."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore
    from corintick_spark.sources.cdf_source import make_cdf_stream_datasource
    from corintick_spark.streaming.events_stream import (
        run_processall_to_memory,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapcdf_") + "/tbl")
    for i in range(3):
        store.append(ev.filter(F.col("event_id") % 3 == i))

    try:
        spark.dataSource.register(make_cdf_stream_datasource())
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise
    src = (
        spark.readStream.format("snapcdf")
        .option("path", store.root)
        .option(
            "columns", "event_id bigint, event_type string, value double"
        )
        .load()
    )
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            .cast("double") / 1_000_000
        ).alias("total_value"),
    )
    return run_processall_to_memory(agg, spark)


# Continuously-maintained MATERIALIZED VIEW — the capstone composition of
# the table layer's pieces: a base store receives 3 appended versions;
# the snapcdf source streams each version as a micro-batch; foreachBatch
# folds each batch into the per-type aggregate with refresh_aggregate
# (O(|batch|), base never rescanned) and commits the refreshed MV to a
# SECOND store via token-idempotent overwrite_once (a retried epoch
# re-derives the same state and must not double-commit). The oracle is a
# full recompute over all appended rows, so the driver adjudicates that
# the incremental fold chain equals the from-scratch aggregate.
@query(
    "stream_ivm",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_scaled
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_ivm(spark, sf_dir):
    """Materialized per-type aggregate maintained incrementally from the
    table's own change stream."""
    import os
    import tempfile as _tf
    import uuid as _uuid

    from corintick_spark.snapshots import SnapshotStore, refresh_aggregate
    from corintick_spark.sources.cdf_source import make_cdf_stream_datasource

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("scaled"),
    )
    base = SnapshotStore(spark, _tf.mkdtemp(prefix="ivm_base_") + "/tbl")
    for i in range(3):
        base.append(ev.filter(F.col("event_id") % 3 == i))
    mv = SnapshotStore(spark, _tf.mkdtemp(prefix="ivm_mv_") + "/tbl")

    try:
        spark.dataSource.register(make_cdf_stream_datasource())
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise

    def refresh(batch_df, batch_id):
        delta = batch_df.withColumn("change_type", F.lit("insert"))
        if mv.latest_version() is None:
            agg = spark.createDataFrame(
                [], "event_type string, n_rows bigint, sum_scaled bigint"
            )
        else:
            agg = mv.read()
        new = refresh_aggregate(
            agg, delta, ["event_type"], {"scaled": "sum_scaled"},
            count_col="n_rows",
        )
        mv.overwrite_once(new.coalesce(1), token=f"epoch-{batch_id}")

    src = (
        spark.readStream.format("snapcdf")
        .option("path", base.root)
        .option(
            "columns", "event_id bigint, event_type string, scaled bigint"
        )
        .load()
    )
    ckpt = _tf.mkdtemp(prefix="ckpt_ivm_")
    q = (
        src.writeStream.foreachBatch(refresh)
        .queryName("ivm" + _uuid.uuid4().hex[:8])
        .option("checkpointLocation", os.path.join(ckpt, "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return mv.read().orderBy("event_type")


# The partition-planning tier of the CDF stream (sources/cdf_source.py::
# make_cdf_partitioned_datasource): same version-per-batch semantics as
# stream_cdf_source, but each added FILE becomes one InputPartition and
# executors read the parquet splits in parallel — rows never funnel
# through the driver-side source runner. This is the tier you run at
# 100 TB; SCALING.md carries the measured simple-vs-partitioned step.
@query(
    "stream_cdf_partitioned",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_cdf_partitioned(spark, sf_dir):
    """3 appended versions streamed through the partitioned CDF source.

    The versions are all committed BEFORE the stream starts — a backlog —
    so the reader runs in catch-up mode (maxVersionsPerBatch, verdict r06
    item 6): the whole backlog plans as one multi-version batch instead
    of one trigger per version, cutting the fixed trigger/WAL cost ~2-3x.
    The per-version cadence contract stays pinned by stream_cdf_source
    (simple tier) and tests/test_cdf_source.py."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore
    from corintick_spark.sources.cdf_source import (
        make_cdf_partitioned_datasource,
    )
    from corintick_spark.streaming.events_stream import (
        run_processall_to_memory,
    )

    # ONE partitioned write stages all three versions (round 12, guide
    # §2.4): the r11 shape checkpointed events and ran one write job per
    # version; append_split scans the parquet source once, writes each
    # version's rows under its split, and commits the same three
    # "append" manifests — identical per-version row sets, no
    # checkpoint blocks to release.
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapcdfp_") + "/tbl")
    store.append_split(ev, F.col("event_id") % 3, 3)

    try:
        spark.dataSource.register(make_cdf_partitioned_datasource())
    except Exception as e:
        msg = str(e).lower()
        if not ("already" in msg and ("exist" in msg or "register" in msg)):
            raise
    src = (
        spark.readStream.format("snapcdfp")
        .option("path", store.root)
        .option(
            "columns", "event_id bigint, event_type string, value double"
        )
        .option("maxVersionsPerBatch", "16")
        .load()
    )
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            .cast("double") / 1_000_000
        ).alias("total_value"),
    )
    return run_processall_to_memory(agg, spark)


# Merge-on-read DELETE via deletion vectors (snapshots.py::delete_where_dv):
# the same logical delete as storage_delete but with ZERO data files
# rewritten — matching rows are recorded as position-delete files and every
# read subtracts them. `inv_mor` carries the merge-on-read property itself
# into the adjudicated result: TRUE only if the post-delete manifest lists
# the IDENTICAL data-file set as the pre-delete one (the whole point of DVs
# at 100 TB — a 0.1% delete must not rewrite terabytes). The oracle
# recomputes the surviving rows and asserts inv_mor literally.
@query(
    "storage_dv",
    sql="""
    SELECT doc_id, n_chars, TRUE AS inv_mor
    FROM documents
    WHERE doc_id % 2 = 0 AND n_chars % 7 != 0
    """,
)
def storage_dv(spark, sf_dir):
    """Deletion-vector DELETE: drop n_chars%7==0 rows merge-on-read; the
    data-file set must be byte-identical across the commit."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapdv_") + "/tbl")
    v0 = store.append(d.filter(F.col("doc_id") % 2 == 0))
    v1 = store.delete_where_dv("n_chars % 7 = 0")
    same_files = [f["path"] for f in store.manifest(v1)["files"]] == [
        f["path"] for f in store.manifest(v0)["files"]
    ]
    return store.read().withColumn("inv_mor", F.lit(bool(same_files)))


# CDC across a deletion-vector delete (snapshots.py::changes): the file
# sets of the two versions are IDENTICAL, so the file-diff channel is
# empty by construction — every emitted row must come from the dv-delta
# resolution (positions semi-joined back to their data rows). The oracle
# recomputes exactly the deleted set.
@query(
    "storage_dv_cdf",
    sql="""
    SELECT doc_id, n_chars, 'delete' AS change_type
    FROM documents
    WHERE doc_id % 2 = 0 AND n_chars % 7 = 0
    """,
)
def storage_dv_cdf(spark, sf_dir):
    """Change feed across a merge-on-read delete: dv-delta rows emitted
    as deletes, nothing else."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapdvcdf_") + "/tbl")
    v0 = store.append(d.filter(F.col("doc_id") % 2 == 0))
    v1 = store.delete_where_dv("n_chars % 7 = 0")
    return store.changes(v0, v1)


# Scoped MERGE full sync (snapshots.py::merge(sync_scope=...)): Delta's
# WHEN NOT MATCHED BY SOURCE THEN DELETE with a condition — the
# re-sync-one-partition-from-an-authoritative-feed pattern. Inside the
# scope (doc_id < 300) the table becomes EXACTLY the source (matched rows
# update, unmatched-by-source rows delete); outside it nothing moves, and
# files disjoint from both the source key range and the scope bounds carry
# forward unrewritten (pinned by tests/test_snapshots.py). The oracle
# recomputes the sync relationally.
@query(
    "storage_merge_sync",
    sql="""
    SELECT doc_id, CAST(n_chars + 1000 AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300
    UNION ALL
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0 AND doc_id >= 300
    """,
)
def storage_merge_sync(spark, sf_dir):
    """Scoped SCD-1 full sync: doc_id<300 re-synced to the doc_id%3
    source; doc_id>=300 untouched."""
    import tempfile as _tf

    from corintick_spark.snapshots import SnapshotStore

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, _tf.mkdtemp(prefix="snapsync_") + "/tbl")
    store.append(d.filter(F.col("doc_id") % 2 == 0).repartitionByRange(4, "doc_id"))
    source = (
        d.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 300))
        .withColumn("n_chars", F.col("n_chars") + F.lit(1000))
    )
    store.merge(
        source, key="doc_id", sync_scope="doc_id < 300",
        scope_prune=("doc_id", 0, 299),
    )
    return store.read()
