"""Custom Python STREAMING sink (PySpark 4 DataSourceStreamWriter): a
JSON-lines sink with per-epoch manifest commit — idempotent under
micro-batch retry.

Completes the connector matrix (sources/tick_source.py: batch + streaming
READ; sources/arrow_sink.py: batch WRITE): the same API a user would
implement to push a stream into a bespoke downstream system (message bus,
tick archive, alerting gateway) with Structured Streaming's exactly-once
epoch contract.

Commit protocol (epoch-manifest, the idempotent-sink standard):

- each write TASK of epoch N streams its rows into
  ``_staging/<uuid>.jsonl`` and returns the staged name + row count;
- the DRIVER's ``commit(messages, batchId)`` renames the staged files to
  ``part-<uuid>.jsonl`` and atomically writes manifest
  ``_commits/<batchId>`` listing EXACTLY those files; a retried epoch
  rewrites its manifest, so files staged by a failed attempt are never
  listed and a duplicate attempt can never double-count;
- ``abort(messages, batchId)`` deletes whatever the attempt staged;
- a consumer (``read_back``) reads the union of manifest-listed files
  ONLY — orphaned part files are invisible, which is what makes the sink
  exactly-once from the reader's point of view (same recipe as Delta/
  Iceberg commit logs, reduced to its minimal JSON-lines form).

Like the other Python connectors, the classes are built by a CLOSURE
FACTORY: Spark runs Python data sources in dedicated worker processes
that do not see addPyFile; cloudpickle ships closure-defined classes by
value, so the sink works under a vanilla driver session.
"""

from __future__ import annotations

import json
import os


def make_jsonl_stream_sink():
    """Build the self-contained ``jsonlsink`` DataSource class (see module
    docstring for why this is a factory)."""
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    @dataclass
    class StagedFile(WriterCommitMessage):
        name: str
        rows: int

    class JsonlEpochWriter(DataSourceStreamWriter):
        def __init__(self, path: str):
            self.path = path

        # --- executor side, once per partition per epoch ----------------
        def write(self, iterator):
            import json as _json
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            _os.makedirs(staging, exist_ok=True)
            name = f"{uuid.uuid4().hex}.jsonl"
            rows = 0
            lines = []
            for row in iterator:
                # sort_keys: byte-stable output regardless of Row field
                # ordering; default=str covers timestamps/decimals
                lines.append(
                    _json.dumps(row.asDict(), sort_keys=True, default=str)
                )
                rows += 1
            if not rows:  # empty partition — nothing staged
                return StagedFile(name="", rows=0)
            with open(_os.path.join(staging, name), "w") as fh:
                fh.write("\n".join(lines) + "\n")
            return StagedFile(name=name, rows=rows)

        # --- driver side, once per epoch --------------------------------
        def commit(self, messages, batchId):
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            commits = _os.path.join(self.path, "_commits")
            _os.makedirs(commits, exist_ok=True)
            final_names = []
            total = 0
            for m in messages:
                if m is not None and m.name:
                    final = f"part-{m.name}"
                    _os.rename(
                        _os.path.join(staging, m.name),
                        _os.path.join(self.path, final),
                    )
                    final_names.append(final)
                    total += m.rows
            # atomic manifest write: tmp + rename; a retried epoch REPLACES
            # its manifest, never appends
            tmp = _os.path.join(commits, f".{batchId}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"files": final_names, "rows": total}, fh)
            _os.replace(tmp, _os.path.join(commits, str(batchId)))

        def abort(self, messages, batchId):
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            for m in messages:
                if m is not None and m.name:
                    try:
                        _os.remove(_os.path.join(staging, m.name))
                    except FileNotFoundError:
                        pass

    class JsonlSinkDataSource(DataSource):
        """``df.writeStream.format("jsonlsink").option("path", dir)``"""

        @classmethod
        def name(cls) -> str:
            return "jsonlsink"

        def streamWriter(self, schema, overwrite):
            import os as _os

            path = self.options.get("path")
            if not path:
                raise ValueError("jsonlsink requires option 'path'")
            _os.makedirs(path, exist_ok=True)
            return JsonlEpochWriter(path)

    return JsonlSinkDataSource, JsonlEpochWriter


def register(spark) -> None:
    """Register the jsonlsink format in this session (idempotent)."""
    try:
        spark.dataSource.register(make_jsonl_stream_sink()[0])
    except Exception:
        pass  # already registered under this name


def read_back(path: str) -> list[dict]:
    """Parse the committed epochs' rows (manifest-listed files ONLY —
    orphaned part files from failed attempts are invisible)."""
    commits = os.path.join(path, "_commits")
    rows: list[dict] = []
    if not os.path.isdir(commits):
        return rows
    # skip dot-entries: a crash between writing '.{batchId}.tmp' and the
    # os.replace leaves a tmp manifest that must stay invisible (same
    # filter committed_epochs applies)
    batches = (b for b in os.listdir(commits) if not b.startswith("."))
    for batch in sorted(batches, key=lambda s: int(s)):
        with open(os.path.join(commits, batch)) as fh:
            manifest = json.load(fh)
        for name in manifest["files"]:
            with open(os.path.join(path, name)) as fh:
                rows.extend(json.loads(l) for l in fh if l.strip())
    return rows


def committed_epochs(path: str) -> list[int]:
    commits = os.path.join(path, "_commits")
    if not os.path.isdir(commits):
        return []
    return sorted(int(b) for b in os.listdir(commits) if not b.startswith("."))
