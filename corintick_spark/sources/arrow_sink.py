"""Custom Python data SINK (PySpark 4 DataSource writer API): an
Arrow-IPC-file sink with real two-phase commit.

Completes the source-extensibility story (sources/tick_source.py covers
batch + streaming READ): the same API a user would implement to push
DataFrames into a bespoke downstream system (feature store, tick archive,
exchange gateway). Uses ``DataSourceArrowWriter`` — executors hand the
writer PyArrow RecordBatches directly, so the data path is Arrow
end-to-end with no per-row Python.

Commit protocol (the FileOutputCommitter-v1 contract, re-expressed):

- each write TASK streams its batches into ``_staging/<uuid>.arrow`` and
  returns the staged name in its commit message;
- the DRIVER's ``commit`` renames exactly the staged files named by the
  collected messages into the destination (atomic per file on POSIX) and
  writes a ``_SUCCESS`` marker;
- ``abort`` deletes whatever the failed job staged. A re-attempted task
  stages under a fresh uuid, so partial/duplicate attempts never leak
  into the committed set.

On a real cluster the destination must be shared storage (same
requirement every file committer has); in local mode any directory works.

Like the streaming tick source, the classes are built by a CLOSURE
FACTORY: Spark runs Python data sources in dedicated worker processes
that do not see addPyFile, so a module-level class pickles by reference
and dies with ModuleNotFoundError under a vanilla driver session.
cloudpickle ships closure-defined classes by value.
"""

from __future__ import annotations

import os


def make_arrow_sink_datasource():
    """Build the self-contained ``arrowsink`` DataSource class (see module
    docstring for why this is a factory)."""
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        WriterCommitMessage,
    )

    @dataclass
    class StagedFile(WriterCommitMessage):
        name: str
        rows: int

    class ArrowIpcWriter(DataSourceArrowWriter):
        def __init__(self, path: str, overwrite: bool):
            self.path = path
            self.overwrite = overwrite

        # --- executor side ---------------------------------------------
        def write(self, iterator):
            import os as _os

            import pyarrow.ipc as ipc

            staging = _os.path.join(self.path, "_staging")
            _os.makedirs(staging, exist_ok=True)
            name = f"{uuid.uuid4().hex}.arrow"
            fpath = _os.path.join(staging, name)
            rows = 0
            writer = None
            try:
                for batch in iterator:
                    if writer is None:
                        writer = ipc.new_file(fpath, batch.schema)
                    writer.write_batch(batch)
                    rows += batch.num_rows
                if writer is None:  # empty partition — nothing staged
                    return StagedFile(name="", rows=0)
            finally:
                if writer is not None:
                    writer.close()
            return StagedFile(name=name, rows=rows)

        # --- driver side -----------------------------------------------
        def commit(self, messages):
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            # crash-safety ordering: move the NEW set in first (staged
            # names are fresh uuids — no collision with the old set), then
            # retire old files. A crash mid-commit leaves old+new files
            # with the PRIOR _SUCCESS intact — a superset readable state —
            # never a partial set that still looks committed.
            old = (
                {f for f in _os.listdir(self.path) if f.endswith(".arrow")}
                if self.overwrite
                else set()
            )
            total = 0
            new_names = set()
            for m in messages:
                if m is not None and m.name:
                    _os.rename(
                        _os.path.join(staging, m.name),
                        _os.path.join(self.path, m.name),
                    )
                    new_names.add(m.name)
                    total += m.rows
            for f in old - new_names:
                _os.remove(_os.path.join(self.path, f))
            with open(_os.path.join(self.path, "_SUCCESS"), "w") as fh:
                fh.write(str(total))
            self._clean_staging()

        def abort(self, messages):
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            for m in messages:
                if m is not None and m.name:
                    try:
                        _os.remove(_os.path.join(staging, m.name))
                    except FileNotFoundError:
                        pass
            self._clean_staging()

        def _clean_staging(self):
            import os as _os

            staging = _os.path.join(self.path, "_staging")
            try:
                if not _os.listdir(staging):
                    _os.rmdir(staging)
            except FileNotFoundError:
                pass

    class ArrowSinkDataSource(DataSource):
        """``df.write.format("arrowsink").option("path", dir).save()``"""

        @classmethod
        def name(cls) -> str:
            return "arrowsink"

        def writer(self, schema, overwrite):
            import os as _os

            path = self.options.get("path")
            if not path:
                raise ValueError("arrowsink requires option 'path'")
            _os.makedirs(path, exist_ok=True)
            return ArrowIpcWriter(path, overwrite)

    return ArrowSinkDataSource, ArrowIpcWriter


def register(spark) -> None:
    """Register the arrowsink format in this session (idempotent)."""
    try:
        spark.dataSource.register(make_arrow_sink_datasource()[0])
    except Exception:
        pass  # already registered under this name


def read_back(path: str):
    """Read every committed .arrow file back into one pyarrow Table
    (test/verification helper — a real consumer would be the downstream
    system)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    tables = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".arrow"):
            with ipc.open_file(os.path.join(path, f)) as r:
                tables.append(r.read_all())
    if not tables:
        return None
    return pa.concat_tables(tables)
