"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) --
SURVEY.md §2.A extensibility: the path a user takes when their source has
no built-in reader (internal service snapshots, bespoke formats).

`SyntheticRowsDataSource` is deliberately deterministic-arithmetic so the
declared query over it stays ORACLE-CHECKABLE: DuckDB re-derives every row
from generate_series. The structure (partitions() -> read(partition)
generator, schema declared up front) is exactly what a real REST/scan
source implements; partition planning drives parallelism just like
parquet splits.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Formula constants -- mirrored in the DuckDB oracle.
MULT = 7919
MOD = 10007


class _Part(InputPartition):
    def __init__(self, part: int, rows: int):
        self.part = part
        self.rows = rows


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options):
        self.parts = int(options.get("parts", "8"))
        self.rows_per_part = int(options.get("rows_per_part", "250"))

    def partitions(self):
        return [_Part(p, self.rows_per_part) for p in range(self.parts)]

    def read(self, partition: _Part):
        base = partition.part * partition.rows
        for i in range(partition.rows):
            rid = base + i
            yield (rid, partition.part, ((rid * MULT) % MOD) / 100.0)


class SyntheticRowsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING read of the same deterministic relation: each micro-batch
    advances the offset by ``rows_per_batch`` ids until ``max_rows`` is
    exhausted -- the Spark 4 `SimpleDataSourceStreamReader` contract
    (initialOffset/read(start) -> (rows, nextOffset)) that a real
    tail-a-service source implements. Deterministic rows keep the drained
    result pinnable against the batch form."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", "500"))
        self.max_rows = int(options.get("max_rows", "2000"))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        first = start["next"]
        if first >= self.max_rows:
            return iter([]), start
        last = min(first + self.rows_per_batch, self.max_rows)
        rows = [
            (rid, rid // 250, ((rid * MULT) % MOD) / 100.0)
            for rid in range(first, last)
        ]
        return iter(rows), {"next": last}

    def readBetweenOffsets(self, start, end):
        rows = [
            (rid, rid // 250, ((rid * MULT) % MOD) / 100.0)
            for rid in range(start["next"], end["next"])
        ]
        return iter(rows)


class SyntheticRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id long, part int, val double"

    def reader(self, schema: StructType) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticRowsStreamReader:
        return SyntheticRowsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticRowsDataSource)
