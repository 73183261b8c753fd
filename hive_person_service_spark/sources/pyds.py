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


# --- Kafka-envelope-shaped source ----------------------------------------
# The environment has no broker or connector jar (streaming/kafka.py
# env-gates real construction), but the RECORD SHAPE a Kafka source yields
# is fixed (key/value binary + topic/partition/offset/timestamp). This
# source emits that exact envelope deterministically, so the entire
# downstream Kafka path -- envelope parse (parse_kafka_json), typed
# payload, per-partition offsets, event-time aggregation -- runs and is
# ORACLE-CHECKED end-to-end; only format("kafka") itself stays env-gated.

import datetime as _dt
import json as _json

_KAFKA_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _kafka_record(part: int, offset: int):
    event_id = part * 1_000_000 + offset
    user_id = (offset * 13 + part * 7) % 50
    val = ((event_id * MULT) % MOD) / 100.0
    payload = _json.dumps(
        {"event_id": event_id, "user_id": user_id, "value": val},
        separators=(",", ":"),
    ).encode()
    return (
        str(user_id).encode(),  # key: partition-by-user producer
        payload,
        "events",
        part,
        offset,
        _KAFKA_BASE_TS + _dt.timedelta(seconds=offset),
        0,
    )


class KafkaEnvelopeReader(DataSourceReader):
    def __init__(self, options):
        self.nparts = int(options.get("topic_partitions", "3"))
        self.offsets = int(options.get("offsets_per_partition", "400"))

    def partitions(self):
        # one Spark partition per topic-partition -- the real connector's
        # parallelism contract
        return [_Part(p, self.offsets) for p in range(self.nparts)]

    def read(self, partition: _Part):
        for o in range(partition.rows):
            yield _kafka_record(partition.part, o)


class KafkaEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched tail of the same topic: each batch advances every
    topic-partition's offset by ``offsets_per_batch`` until
    ``offsets_per_partition`` is exhausted (mirrors maxOffsetsPerTrigger)."""

    def __init__(self, options):
        self.nparts = int(options.get("topic_partitions", "3"))
        self.offsets = int(options.get("offsets_per_partition", "400"))
        self.per_batch = int(options.get("offsets_per_batch", "100"))

    def initialOffset(self):
        return {"next": 0}

    def _rows(self, first: int, last: int):
        # materialized list, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator between read() and commit
        return [
            _kafka_record(p, o)
            for p in range(self.nparts)
            for o in range(first, last)
        ]

    def read(self, start):
        first = start["next"]
        if first >= self.offsets:
            return iter([]), start
        last = min(first + self.per_batch, self.offsets)
        return iter(self._rows(first, last)), {"next": last}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["next"], end["next"]))


class KafkaEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_envelope_synthetic"

    def schema(self) -> str:
        return (
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp, timestampType int"
        )

    def reader(self, schema: StructType) -> KafkaEnvelopeReader:
        return KafkaEnvelopeReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KafkaEnvelopeStreamReader:
        return KafkaEnvelopeStreamReader(self.options)


def register_kafka_envelope_source(spark) -> None:
    spark.dataSource.register(KafkaEnvelopeDataSource)


# ---------------------------------------------------------------------------
# Python DataSource WRITER (two-phase commit)
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _WroteFile(WriterCommitMessage):
    """Executor -> driver commit message: one staged file per task."""

    tmp_path: str
    rows: int


class JsonLinesWriter(DataSourceWriter):
    """Executor-side write + driver-side two-phase commit: each task
    streams its partition to a staging file and returns a commit message;
    only the driver's commit() publishes the staged files (rename +
    _SUCCESS marker), and abort() removes them. This is the exact
    task-commit protocol a real object-store sink implements (staged
    multipart uploads committed by manifest); local rename stands in for
    the final PUT."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("json_lines sink requires option 'path'")

    def write(self, iterator):
        import json as _json
        import os
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_staged_{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages):
        import os

        for i, m in enumerate(messages):
            os.replace(m.tmp_path, os.path.join(self.path, f"part-{i:05d}.jsonl"))
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonLinesSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "json_lines_sink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options)


def register_json_lines_sink(spark) -> None:
    spark.dataSource.register(JsonLinesSinkDataSource)
