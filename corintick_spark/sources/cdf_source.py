"""Streaming source over a SnapshotStore's version history — the
Delta-style "stream from a table" shape: each committed version becomes
one micro-batch, offsets ARE version numbers, and any offset range is
re-readable from the immutable manifests + data files (exactly-once
replay for free).

Contract mirrors Delta's streaming source default: the history must be
append-only from the stream's point of view — a version that REMOVES
files (compaction, merge rewrite, delete) raises, because its row-level
delta is not representable as an append batch (Delta calls the escape
hatch skipChangeCommits; the batch-side :meth:`SnapshotStore.changes` is
this store's full-CDC path).

Like tick_source.make_stream_datasource, the class is closure-defined and
self-contained: the driver-side streaming source runner is a separate
Python process that never sees addPyFile, so the class must pickle BY
VALUE with only stdlib/pyarrow imports inside method bodies.
"""

from __future__ import annotations


def make_cdf_stream_datasource():
    """Self-contained `snapcdf` streaming DataSource.

    Options: `path` (SnapshotStore root), `columns` (DDL string, e.g.
    ``"event_id bigint, event_type string, value double"`` — the caller
    names the projection; parquet supplies the values)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class CdfReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.root = options.get("path")
            self.cols = [
                c.strip().split(" ")[0]
                for c in options.get("columns").split(",")
            ]

        def _versions(self):
            import os

            d = os.path.join(self.root, "_snapshots")
            if not os.path.isdir(d):
                return []
            out = []
            for n in os.listdir(d):
                if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit():
                    out.append(int(n[1:-5]))
            return sorted(out)

        def _manifest(self, v):
            import json
            import os

            with open(
                os.path.join(self.root, "_snapshots", f"v{v}.json")
            ) as fh:
                return json.load(fh)

        def _rows_added(self, v):
            import os

            import pyarrow.parquet as pq

            m = self._manifest(v)
            prev = set()
            if v > 0:
                prev = {f["path"] for f in self._manifest(v - 1)["files"]}
                cur = {f["path"] for f in m["files"]}
                if not prev <= cur:
                    raise ValueError(
                        f"version {v} ({m.get('operation')}) removed files — "
                        "the snapcdf stream supports append-only history "
                        "(Delta's skipChangeCommits shape); use "
                        "SnapshotStore.changes() for full CDC"
                    )
            rows = []
            for f in m["files"]:
                if f["path"] in prev:
                    continue
                tbl = pq.read_table(
                    os.path.join(self.root, f["path"]), columns=self.cols
                )
                rows.extend(
                    tuple(r[c] for c in self.cols) for r in tbl.to_pylist()
                )
            return rows

        def initialOffset(self):
            return {"v": -1}

        def read(self, start):
            v = int(start["v"])
            if v + 1 not in self._versions():
                # caught up: offset stops advancing, which is how
                # processAllAvailable() detects quiescence
                return iter([]), {"v": v}
            return iter(self._rows_added(v + 1)), {"v": v + 1}

        def readBetweenOffsets(self, start, end):
            rows = []
            for v in range(int(start["v"]) + 1, int(end["v"]) + 1):
                rows.extend(self._rows_added(v))
            return rows

        def commit(self, end):
            pass

    class CdfDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "snapcdf"

        def schema(self) -> str:
            return self.options.get("columns")

        def simpleStreamReader(self, schema):
            return CdfReader(self.options)

    return CdfDataSource


def make_cdf_partitioned_datasource():
    """`snapcdfp` — the partition-planning tier of the CDF stream source
    (DataSourceStreamReader instead of SimpleDataSourceStreamReader): the
    driver-side runner only diffs manifests; each ADDED FILE becomes one
    InputPartition, so executors read the parquet files in parallel and
    rows never funnel through the driver — the shape that removes the
    row-tuple bottleneck SCALING.md measured on the simple tier (2.84×
    at 10× data). Offsets are still version numbers (one version per
    micro-batch via rate-limited latestOffset); the same append-only
    contract raises on file-removing versions."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class FilePartition(InputPartition):
        def __init__(self, path, cols):
            self.path = path
            self.cols = cols

    class CdfPartitionedReader(DataSourceStreamReader):
        def __init__(self, options):
            self.root = options.get("path")
            self.cols = [
                c.strip().split(" ")[0]
                for c in options.get("columns").split(",")
            ]

        def _versions(self):
            import os

            d = os.path.join(self.root, "_snapshots")
            if not os.path.isdir(d):
                return []
            return sorted(
                int(n[1:-5])
                for n in os.listdir(d)
                if n.startswith("v") and n.endswith(".json")
                and n[1:-5].isdigit()
            )

        def _manifest(self, v):
            import json
            import os

            with open(
                os.path.join(self.root, "_snapshots", f"v{v}.json")
            ) as fh:
                return json.load(fh)

        def initialOffset(self):
            return {"v": -1}

        def latestOffset(self):
            # rate-limit to ONE version per micro-batch so each commit
            # replays as its own batch (same cadence as the simple tier)
            vs = self._versions()
            latest = vs[-1] if vs else -1
            cur = getattr(self, "_last", -1)
            nxt = min(cur + 1, latest)
            self._last = nxt
            return {"v": nxt}

        def partitions(self, start, end):
            import os

            parts = []
            for v in range(int(start["v"]) + 1, int(end["v"]) + 1):
                m = self._manifest(v)
                prev = set()
                if v > 0:
                    prev = {
                        f["path"] for f in self._manifest(v - 1)["files"]
                    }
                    cur = {f["path"] for f in m["files"]}
                    if not prev <= cur:
                        raise ValueError(
                            f"version {v} ({m.get('operation')}) removed "
                            "files — snapcdfp requires append-only history"
                        )
                parts.extend(
                    FilePartition(os.path.join(self.root, f["path"]), self.cols)
                    for f in m["files"]
                    if f["path"] not in prev
                )
            # Spark requires >=1 partition per batch; an all-carried batch
            # (e.g. a constraint/index commit) contributes an empty one
            return parts or [FilePartition(None, self.cols)]

        def read(self, partition):
            if partition.path is None:
                return iter([])
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.path, columns=partition.cols)
            return iter(
                [
                    tuple(r[c] for c in partition.cols)
                    for r in tbl.to_pylist()
                ]
            )

        def commit(self, end):
            pass

    class CdfPartitionedDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "snapcdfp"

        def schema(self) -> str:
            return self.options.get("columns")

        def streamReader(self, schema):
            return CdfPartitionedReader(self.options)

    return CdfPartitionedDataSource
