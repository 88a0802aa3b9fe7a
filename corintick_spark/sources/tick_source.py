"""Custom Python data source (PySpark 4 DataSource API): a deterministic
synthetic tick generator.

Demonstrates the engine's source-extensibility path — the same API a user
would implement to ingest a bespoke feed (exchange protocol dump, internal
binary format) straight into DataFrame land with real partitioning: each
InputPartition generates its stripe independently on an executor, so the
source scales out like any file-based one. Generation is pure integer
arithmetic on the row id, so results are reproducible and oracle-checkable
(the DuckDB mirror recomputes the same formula from range()).

Register once per session, then:
    spark.dataSource.register(TickDataSource)
    spark.read.format("pyticks").option("rows", 10000).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth multiplicative hash constant / a prime modulus: cheap, deterministic,
# well-spread values without platform-dependent RNG.
MULT = 2654435761
MOD = 1_000_003
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch microseconds


def row_at(i: int, n_uids: int) -> tuple[int, int, int, float]:
    return (
        i,
        i % n_uids,
        BASE_US + i * 1_000_000,
        ((i * MULT) % MOD) / 1000.0,
    )


class TickReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.n_uids = int(options.get("uids", 50))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        # Stripe i takes ids i, i+parts, i+2*parts, ... — equal-sized
        # stripes with no coordination between executors.
        for i in range(partition.value, self.rows, self.parts):
            yield row_at(i, self.n_uids)


class TickDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyticks"

    def schema(self) -> str:
        return "id bigint, uid bigint, ts_us bigint, value double"

    def reader(self, schema) -> TickReader:
        return TickReader(self.options)


def make_stream_datasource():
    """Build a SELF-CONTAINED streaming DataSource class (closure-defined,
    constants inlined, no references into this package).

    Why: executor workers receive the package via addPyFile, but the
    streaming *source runner* is a separate driver-side Python process that
    does NOT — a module-level class pickles by reference and hits
    ModuleNotFoundError there. cloudpickle serializes closure-defined
    classes BY VALUE, so this factory's product runs anywhere.

    Contract (PySpark 4 SimpleDataSourceStreamReader): offsets are row
    indices; each micro-batch advances by ``batchRows`` until ``rows`` is
    exhausted, after which the offset stops moving — how Structured
    Streaming detects "no new data" and lets processAllAvailable()
    terminate. readBetweenOffsets() regenerates any (start, end) range
    identically from the id formula — exactly-once replay."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    mult, mod, base_us = 2654435761, 1_000_003, 1_704_067_200_000_000

    def _row(i: int, n_uids: int):
        return (i, i % n_uids, base_us + i * 1_000_000, ((i * mult) % mod) / 1000.0)

    class StreamTickReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 5000))
            self.batch = int(options.get("batchRows", 1000))
            self.n_uids = int(options.get("uids", 50))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            # iter(list), not a bare generator or list: the wrapper's
            # prefetch cache copy.copy()s the iterator (generators can't be
            # copied) and probes exhaustion with next() (lists aren't
            # iterators)
            i0 = int(start["i"])
            i1 = min(i0 + self.batch, self.rows)
            return iter([_row(i, self.n_uids) for i in range(i0, i1)]), {"i": i1}

        def readBetweenOffsets(self, start, end):
            return [
                _row(i, self.n_uids) for i in range(int(start["i"]), int(end["i"]))
            ]

        def commit(self, end):
            pass

    class StreamTickDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "pyticks_stream"

        def schema(self) -> str:
            return "id bigint, uid bigint, ts_us bigint, value double"

        def simpleStreamReader(self, schema):
            return StreamTickReader(self.options)

    return StreamTickDataSource
