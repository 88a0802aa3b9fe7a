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
