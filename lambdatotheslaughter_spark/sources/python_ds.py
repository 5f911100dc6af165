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
