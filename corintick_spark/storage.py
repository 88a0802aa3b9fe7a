"""TickStore — reference-parity storage layer (SURVEY.md §2.1, M1).

corintick's API surface (all †, per SURVEY.md §0 convention):

- ``Corintick.write(uid, df, **metadata)`` — chunk + serialize + insert_many
  (api.py::Corintick.write, serialization.py::make_bson_doc)
- ``Corintick.read(uid, start, end, columns)`` — index seek + projection +
  concat + trim (api.py::Corintick.read, serialization.py::build_dataframe)
- ``Corintick.list_uids()`` — server-side $group (api.py::Corintick.list_uids)

Spark-first re-expression: one partitioned Parquet dataset per "collection".
Chunking, per-column compression, and min/max chunk stats are Parquet-native
(row groups + zstd + stats); the (uid, start, end) B-tree becomes Hive
partition pruning on ``uid`` plus row-group stat skipping on ``ts``.

Scale design: data is written ``partitionBy(uid)`` with
``sortWithinPartitions(ts)`` so that (a) a single-uid range read prunes to
one partition directory and then skips row groups by ts stats, and (b) full
scans stream in time order per uid without a sort. For very high uid
cardinality (100 TB, millions of uids) use ``bucket_uids=N`` to hash uids
into N directories instead of one-dir-per-uid (avoids small-file explosion
while keeping pruning ~N-fold effective).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import StructType


@dataclass
class TickStore:
    """A uid-keyed time-series dataset over partitioned Parquet."""

    spark: SparkSession
    root: str
    uid_col: str = "uid"
    ts_col: str = "ts"
    bucket_uids: int | None = None  # hash uids into N dirs (high-cardinality)
    partition_by_date: bool = False  # add a ts-derived date partition level

    # -- write path: api.py::Corintick.write † ------------------------------
    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        check_overlap: bool = False,
        **metadata: str,
    ) -> None:
        """Append a frame. Mirrors corintick write: validates ts presence,
        optionally detects overlap with existing data for the same uids
        (api.py::Corintick.write † overlap warning), partitions by uid.
        """
        if self.uid_col not in df.columns or self.ts_col not in df.columns:
            raise ValueError(f"frame must have {self.uid_col!r} and {self.ts_col!r}")
        if check_overlap and self._exists():
            # bounded action: only up to 10 example uids ever reach the driver
            sample = self.overlap_conflicts(df).select(self.uid_col).limit(10).collect()
            if sample:
                raise ValueError(
                    f"write overlaps existing data for uids: {[r[0] for r in sample]}"
                )
        out, part_cols = self._partitioned(df)
        (
            out.repartition(*[F.col(c) for c in part_cols])
            .sortWithinPartitions(self.ts_col)
            .write.mode(mode)
            .partitionBy(*part_cols)
            .parquet(self._data_dir())
        )
        # Schema sidecar: partition-directory values lose their type (Spark
        # re-infers them on read — a string uid '3' comes back as int), the
        # corintick dtype round-trip guarantee (serialization.py † dtype
        # strings) needs the written schema recorded. Appends with NEW
        # columns merge into the sidecar (corintick allowed different chunks
        # of one uid to carry different column sets † — SURVEY §1.1), with
        # the latest write winning per-column. Local-FS write; on a real
        # cluster this sidecar lives next to the dataset via the hadoop FS
        # API.
        os.makedirs(self.root, exist_ok=True)
        schema = df.schema
        if mode == "append" and os.path.exists(self._schema_path()):
            with open(self._schema_path()) as fh:
                prior = StructType.fromJson(json.load(fh))
            new_names = set(schema.fieldNames())
            merged = list(schema.fields) + [
                f for f in prior.fields if f.name not in new_names
            ]
            schema = StructType(merged)
        with open(self._schema_path(), "w") as fh:
            fh.write(schema.json())
        if metadata:
            self.put_metadata(metadata)
            self._log_write_metadata(df, metadata)

    def _partitioned(self, df: DataFrame) -> tuple[DataFrame, list[str]]:
        """Apply the store's configured partition layout (plain uid, hashed
        uid buckets, optional date sub-partition) to an outgoing frame —
        shared by write() and compact() so maintenance can never silently
        rewrite a store into a different layout."""
        part_col = self.uid_col
        out = df
        if self.bucket_uids:
            part_col = "uid_bucket"
            out = out.withColumn(
                part_col, F.pmod(F.xxhash64(F.col(self.uid_col)), F.lit(self.bucket_uids))
            )
        part_cols = [part_col]
        if self.partition_by_date:
            # date sub-partition: a 100 TB time series prunes range reads to
            # the touched days BEFORE any file is opened (the second key of
            # the reference's (uid,start,end) index †)
            out = out.withColumn("_date", F.col(self.ts_col).cast("date"))
            part_cols.append("_date")
        return out, part_cols

    # -- read path: api.py::Corintick.read † --------------------------------
    def read(
        self,
        uids: list | None = None,
        start: str | datetime | None = None,
        end: str | datetime | None = None,
        columns: list[str] | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """read(uid, start, end, columns): partition pruning on uid, pushed
        ts range filter (row-group stats do the chunk-level prune), column
        pruning — each the Catalyst analogue of the reference's index seek,
        interval filter, and Mongo projection (api.py::Corintick.read †).
        Range semantics inclusive of both ends, like DataFrame.loc[start:end].

        ``merge_schema=True`` unions the schemas of every data file
        (columns absent from older appends come back NULL) — corintick
        allowed different chunks of one uid to carry different column sets
        (SURVEY §1.1 †); heterogeneous appends need this flag to see every
        column. The default stays False: schema merging foots the bill of a
        footer read per file, which a 100 TB store pays only when asked.
        """
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self._data_dir())
        if self.bucket_uids and "uid_bucket" in df.columns and uids is not None:
            # Bucket-level partition pruning: hash the requested uids with
            # the same (dtype-faithful) function the write path used, so a
            # k-uid read opens at most k bucket directories — the analogue
            # of the reference's B-tree point seek.
            df = df.filter(F.col("uid_bucket").isin(self._buckets_for(uids)))
        if self.bucket_uids and "uid_bucket" in df.columns:
            df = df.drop("uid_bucket")
        if self.partition_by_date and "_date" in df.columns:
            # partition-prune on the date level before the row-level ts filter
            if start is not None:
                df = df.filter(F.col("_date") >= F.lit(start).cast("date"))
            if end is not None:
                df = df.filter(F.col("_date") <= F.lit(end).cast("date"))
            df = df.drop("_date")
        if os.path.exists(self._schema_path()):
            with open(self._schema_path()) as fh:
                written = StructType.fromJson(json.load(fh))
            for f in written.fields:
                if f.name in df.columns and df.schema[f.name].dataType != f.dataType:
                    df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        if uids is not None:
            df = df.filter(F.col(self.uid_col).isin(list(uids)))
        if start is not None:
            df = df.filter(F.col(self.ts_col) >= F.lit(start).cast("timestamp"))
        if end is not None:
            df = df.filter(F.col(self.ts_col) <= F.lit(end).cast("timestamp"))
        if columns is not None:
            keep = [self.uid_col, self.ts_col] + [
                c for c in columns if c not in (self.uid_col, self.ts_col)
            ]
            df = df.select(*keep)
        return df

    # -- streaming ingestion (north_star: live tick ingestion via Spark) ----
    def append_stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_available_now: bool = False,
        merge: bool = False,
    ):
        """Continuously append a streaming frame into the store layout
        (same partitioning as batch writes; readers see files as micro-
        batches commit). Returns the StreamingQuery; caller manages its
        lifecycle. Overlap checking is a batch-maintenance concern — run
        `overlapping_uids` on compaction, not per micro-batch.

        ``merge=True`` routes each micro-batch through :meth:`upsert`
        instead of a blind append — the streaming CDC-ingestion shape
        (late corrections replace earlier rows for the same (uid, ts)).
        foreachBatch makes this exactly-once-ish the standard way: the
        upsert is idempotent per key, so a replayed batch converges."""
        if self.bucket_uids or self.partition_by_date:
            raise NotImplementedError(
                "streaming append currently supports the plain uid layout"
            )
        data_dir = self._data_dir()
        uid_col, ts_col = self.uid_col, self.ts_col

        # foreachBatch + the normal batch writer, NOT the parquet streaming
        # sink: the file sink's _spark_metadata log would make batch reads
        # of the directory ignore every non-streaming-written file (so a
        # store seeded by batch writes would silently lose them).
        def _write_batch(batch_df: DataFrame, _batch_id: int) -> None:
            if merge:
                self.upsert(batch_df)
                return
            (
                batch_df.repartition(F.col(uid_col))
                .sortWithinPartitions(ts_col)
                .write.mode("append")
                .partitionBy(uid_col)
                .parquet(data_dir)
            )

        writer = (
            stream_df.writeStream.foreachBatch(_write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def stream(self) -> DataFrame:
        """The store as a streaming source: new files appended by writers
        (batch or streaming) arrive as micro-batches — the live read side
        of the tick store."""
        batch = self.read()
        return self.spark.readStream.schema(batch.schema).parquet(self._data_dir())

    # -- catalog: api.py::Corintick.list_uids † -----------------------------
    def list_uids(self) -> DataFrame:
        """Per-uid doc-count/first/last — the $group pipeline, distributed."""
        df = self.read()
        return df.groupBy(self.uid_col).agg(
            F.count("*").alias("n_rows"),
            F.min(self.ts_col).alias("start"),
            F.max(self.ts_col).alias("end"),
        )

    # -- overlap detection: api.py::Corintick.write † validation ------------
    def overlap_conflicts(self, new_df: DataFrame) -> DataFrame:
        """Composable overlap guard: one row per uid whose incoming
        [min ts, max ts] extent overlaps stored data, with both extents
        attached (uid, new_start, new_end, old_start, old_end). Pure plan —
        no driver collect — so a pipeline can anti-join its incoming frame
        against this, route conflicts to a quarantine sink, or count them,
        all inside one distributed job (T-A13)."""
        existing = self.list_uids()
        incoming = new_df.groupBy(self.uid_col).agg(
            F.min(self.ts_col).alias("new_start"), F.max(self.ts_col).alias("new_end")
        )
        return (
            incoming.join(
                existing,
                (incoming[self.uid_col] == existing[self.uid_col])
                & (existing["start"] <= incoming["new_end"])
                & (existing["end"] >= incoming["new_start"]),
            )
            .select(
                incoming[self.uid_col],
                "new_start",
                "new_end",
                F.col("start").alias("old_start"),
                F.col("end").alias("old_end"),
            )
        )

    def overlapping_uids(self, new_df: DataFrame) -> list:
        """Uids whose new [min ts, max ts] interval overlaps stored data —
        driver-side convenience over :meth:`overlap_conflicts`. Catalog-
        scale by construction (one row per overlapping uid)."""
        return [
            r[0] for r in self.overlap_conflicts(new_df).select(self.uid_col).collect()
        ]

    # -- metadata: api.py::Corintick.write † **metadata kwargs --------------
    def put_metadata(self, kv: dict) -> None:
        pdf = self.spark.createDataFrame(
            [(str(k), str(v)) for k, v in kv.items()], "key string, value string"
        )
        pdf.write.mode("append").parquet(self._meta_dir())

    def get_metadata(self) -> dict:
        if not os.path.isdir(self._meta_dir()):
            return {}
        rows = self.spark.read.parquet(self._meta_dir()).collect()
        return {r["key"]: r["value"] for r in rows}

    def _log_write_metadata(self, df: DataFrame, metadata: dict) -> None:
        """Record this write's metadata per uid it touched — corintick
        attached the **metadata dict to every chunk document of the write
        (api.py::Corintick.write †), so metadata is addressable by uid, not
        just store-wide. The uid set of a metadata-carrying write is small
        by construction (one collect of distinct uids)."""
        uids = [r[0] for r in df.select(self.uid_col).distinct().collect()]
        next_id = 0
        if os.path.isdir(self._writes_dir()):
            prev = (
                self.spark.read.parquet(self._writes_dir())
                .agg(F.max("write_id"))
                .collect()[0][0]
            )
            next_id = (prev if prev is not None else -1) + 1
        rows = [
            (next_id, str(u), str(k), str(v))
            for u in uids
            for k, v in metadata.items()
        ]
        self.spark.createDataFrame(
            rows, "write_id long, uid string, key string, value string"
        ).write.mode("append").parquet(self._writes_dir())

    def metadata_for(self, uid) -> dict:
        """Merged metadata of every write that included ``uid`` (later
        writes win per key) — the per-document metadata view of the
        reference, T-A14."""
        if not os.path.isdir(self._writes_dir()):
            return {}
        rows = (
            self.spark.read.parquet(self._writes_dir())
            .filter(F.col("uid") == str(uid))
            .orderBy("write_id")
            .collect()
        )
        out: dict = {}
        for r in rows:
            out[r["key"]] = r["value"]
        return out

    # -- maintenance ---------------------------------------------------------
    def compact(self, zorder_by: list[str] | None = None) -> int:
        """Rewrite the dataset into one time-sorted file chain per uid
        partition — the maintenance pass that follows streaming ingestion
        (each micro-batch appends a small file per touched uid; corintick
        had the same fragmentation with per-write chunk documents †).

        ``zorder_by=[colA, colB]`` clusters rows inside each partition on
        the Morton key of the given columns instead of plain time order
        (operators/zorder.py) — narrows per-file min-max stats on EVERY
        listed dimension, so scans filtered by secondary columns also
        prune files. Use when queries filter on more than the time axis.

        Local-FS implementation writes to a sibling directory and swaps via
        rename; on a real cluster use the same pattern through the Hadoop
        FileSystem API (or table-format compaction). Returns the number of
        data files after compaction.
        """
        import shutil

        data_dir = self._data_dir()
        tmp_dir = data_dir + ".compact_tmp"
        old_dir = data_dir + ".compact_old"
        # merge_schema: heterogeneous appends must not lose columns in the
        # rewrite; _partitioned(): the rewrite must reproduce the store's
        # configured layout (uid buckets / date level), not reset it to
        # plain-uid partitioning.
        out, part_cols = self._partitioned(self.read(merge_schema=True))
        out = out.repartition(*[F.col(c) for c in part_cols])
        if zorder_by:
            from corintick_spark.operators.zorder import with_zvalue

            out = (
                with_zvalue(out, zorder_by)
                .sortWithinPartitions("_zvalue")
                .drop("_zvalue")
            )
        else:
            out = out.sortWithinPartitions(self.ts_col)
        (
            out.write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp_dir)
        )
        os.rename(data_dir, old_dir)
        os.rename(tmp_dir, data_dir)
        shutil.rmtree(old_dir)
        return sum(
            1
            for root, _, files in os.walk(data_dir)
            for f in files
            if f.endswith(".parquet")
        )

    def upsert(self, df: DataFrame, keys: list[str] | None = None) -> None:
        """MERGE semantics on the store: rows of ``df`` REPLACE existing
        rows with the same key (default key: (uid, ts)); everything else
        appends. Implemented as the read-side cdc_merge compaction turned
        into a write: union old + new with a batch-priority flag, keep the
        newest row per key (new batch wins ties), rewrite-and-swap (the
        compact() pattern). On a table format (Iceberg/Delta) this is the
        engine-level MERGE INTO; on plain parquet the rewrite is the
        correct — if heavier — equivalent, and the per-uid layout bounds
        the rewrite to touched partitions on a real cluster.
        """
        if self.uid_col not in df.columns or self.ts_col not in df.columns:
            raise ValueError(f"frame must have {self.uid_col!r} and {self.ts_col!r}")
        keys = keys or [self.uid_col, self.ts_col]
        if not self._exists():
            self.write(df, mode="overwrite")
            return
        from pyspark.sql import Window as W

        old = self.read(merge_schema=True).withColumn("_prio", F.lit(0))
        new = df.withColumn("_prio", F.lit(1))
        for c in old.columns:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast(dict(old.dtypes)[c]))
        for c in new.columns:
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(dict(new.dtypes)[c]))
        merged = (
            old.unionByName(new)
            .withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy(*keys).orderBy(F.desc("_prio"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn")
        )
        import shutil

        data_dir = self._data_dir()
        tmp_dir = data_dir + ".upsert_tmp"
        old_dir = data_dir + ".upsert_old"
        out, part_cols = self._partitioned(merged)
        (
            out.repartition(*[F.col(c) for c in part_cols])
            .sortWithinPartitions(self.ts_col)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp_dir)
        )
        os.rename(data_dir, old_dir)
        os.rename(tmp_dir, data_dir)
        shutil.rmtree(old_dir)

    def delete_uid(self, uid) -> bool:
        """Drop one uid's data. With plain uid partitioning this is a pure
        directory removal (metadata-operation shape, like vacuum's date
        path); bucketed layouts share directories between uids, so there
        it falls back to a layout-preserving filtered rewrite (compact()
        swap pattern). Returns True if anything was deleted."""
        import shutil

        data_dir = self._data_dir()
        if not self._exists():
            return False
        if not self.bucket_uids:
            # one uid == one partition directory (possibly with date
            # sub-partitions inside) — removal is a file operation
            part = os.path.join(data_dir, f"{self.uid_col}={uid}")
            if not os.path.exists(part):
                return False
            shutil.rmtree(part)
            return True
        existing = self.read(merge_schema=True)
        if existing.filter(F.col(self.uid_col) == F.lit(uid)).limit(1).count() == 0:
            return False
        kept, part_cols = self._partitioned(
            existing.filter(F.col(self.uid_col) != F.lit(uid))
        )
        tmp_dir = data_dir + ".delete_tmp"
        old_dir = data_dir + ".delete_old"
        (
            kept.repartition(*[F.col(c) for c in part_cols])
            .sortWithinPartitions(self.ts_col)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp_dir)
        )
        os.rename(data_dir, old_dir)
        os.rename(tmp_dir, data_dir)
        shutil.rmtree(old_dir)
        return True

    def vacuum(self, before) -> int:
        """Retention pass: drop all rows with ``ts`` date earlier than
        ``before`` (a date / 'YYYY-MM-DD' string). Two execution paths:

        - **date-partitioned store** (``partition_by_date=True``): expired
          data is whole ``_date=...`` directories — removed with pure file
          operations, NO data rewrite. This is the 100 TB path: retention
          on a properly partitioned store is a metadata operation (the
          same shape as dropping table-format partitions).
        - otherwise: filter-and-rewrite via the compact() swap pattern —
          correct everywhere, but rewrites the surviving data; the
          docstring contract tells users to date-partition stores that
          need retention.

        Returns the number of partition directories (date path) or files
        (rewrite path) removed.
        """
        import shutil
        from datetime import date as _date

        cutoff = before if isinstance(before, _date) else _date.fromisoformat(str(before))
        data_dir = self._data_dir()
        if self.partition_by_date:
            removed = 0
            for root, dirs, _ in os.walk(data_dir):
                for d in list(dirs):
                    if not d.startswith("_date="):
                        continue
                    try:
                        part_date = _date.fromisoformat(d.split("=", 1)[1])
                    except ValueError:
                        continue
                    if part_date < cutoff:
                        shutil.rmtree(os.path.join(root, d))
                        removed += 1
            return removed
        before_files = sum(
            1 for r, _, fs in os.walk(data_dir) for f in fs if f.endswith(".parquet")
        )
        tmp_dir = data_dir + ".vacuum_tmp"
        old_dir = data_dir + ".vacuum_old"
        kept, part_cols = self._partitioned(
            self.read(merge_schema=True).filter(
                F.col(self.ts_col).cast("date") >= F.lit(cutoff.isoformat()).cast("date")
            )
        )
        (
            kept.repartition(*[F.col(c) for c in part_cols])
            .sortWithinPartitions(self.ts_col)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp_dir)
        )
        os.rename(data_dir, old_dir)
        os.rename(tmp_dir, data_dir)
        shutil.rmtree(old_dir)
        after_files = sum(
            1 for r, _, fs in os.walk(data_dir) for f in fs if f.endswith(".parquet")
        )
        return max(0, before_files - after_files)

    # -- helpers -------------------------------------------------------------
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    def _writes_dir(self) -> str:
        return os.path.join(self.root, "_writes")

    def _schema_path(self) -> str:
        return os.path.join(self.root, "_schema.json")

    def _buckets_for(self, uids: list) -> list[int]:
        """Bucket ids for the given uids, hashed with the written uid dtype
        (xxhash64(string) != xxhash64(long) — the sidecar keeps them aligned)."""
        from pyspark.sql.types import StringType, StructField, StructType

        dtype = StringType()
        if os.path.exists(self._schema_path()):
            with open(self._schema_path()) as fh:
                written = StructType.fromJson(json.load(fh))
            if self.uid_col in written.fieldNames():
                dtype = written[self.uid_col].dataType
        tiny = self.spark.createDataFrame(
            [(u,) for u in uids], StructType([StructField(self.uid_col, dtype)])
        )
        rows = tiny.select(
            F.pmod(F.xxhash64(F.col(self.uid_col)), F.lit(self.bucket_uids)).alias("b")
        ).distinct().collect()
        return [r["b"] for r in rows]

    def _exists(self) -> bool:
        d = self._data_dir()
        return os.path.isdir(d) and any(
            not f.startswith(("_", ".")) for f in os.listdir(d)
        )
