"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
extension point a real deployment uses to ingest from systems Spark has no
built-in connector for (REST feeds, proprietary stores, message buses).

`TicksDataSource` is a deterministic synthetic tick generator: `p`
partitions × `n` rows each, every cell a pure function of (partition, seq)
— so the whole source is value-reproducible and the DuckDB oracle can
regenerate it from `range()` arithmetic. The partition list drives REAL
parallel reads: each InputPartition becomes one Spark task calling
`read()` independently, exactly how a Kafka-partition or shard-parallel
connector distributes at scale.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _TicksReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("parts", 8))
        self.rows_per_part = int(options.get("rows", 1000))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        p = partition.value
        n = self.rows_per_part
        for i in range(n):
            # pure arithmetic of (p, i): reproducible anywhere, no state
            yield (p, i, (p * 31 + i * 7) % 1000)


class TicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lts_ticks"

    def schema(self) -> str:
        return "part_id int, seq int, value int"

    def reader(self, schema):
        return _TicksReader(self.options)


class _CounterStreamReader:
    """SimpleDataSourceStreamReader over a bounded deterministic feed:
    offsets are {"pos": n}, read() serves at most CHUNK rows past the
    committed offset, readBetweenOffsets() replays any committed-but-
    unflushed range exactly — the contract that makes restart-from-
    checkpoint exactly-once for a custom connector."""

    N = 900
    CHUNK = 450

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.CHUNK, self.N)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["pos"], end["pos"]))

    @staticmethod
    def _rows(a: int, b: int):
        return [(i, i * 3) for i in range(a, b)]


class CounterStreamDataSource(DataSource):
    """Streaming Python DataSource (Spark 4): the custom-connector analog
    of a Kafka topic — offset-tracked, checkpointable, replayable."""

    @classmethod
    def name(cls) -> str:
        return "lts_counter_stream"

    def schema(self) -> str:
        return "i int, v int"

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        class R(_CounterStreamReader, SimpleDataSourceStreamReader):
            pass

        return R()
