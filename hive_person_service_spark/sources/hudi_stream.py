"""Streaming FROM a Hudi table: a Spark 4 Python DataSource whose
stream offsets are TIMELINE INSTANTS -- ``spark.readStream
.format("hudi_tail").option("table", path)`` tails the completed
timeline and serves, per micro-batch, the records each pending commit
WROTE (rows whose ``_hoodie_commit_time`` equals the commit's instant
-- Hudi's own incremental-query semantics, so carried-over rows in a
CoW rewrite never re-stream).  The Delta and Iceberg twins live in
delta_stream.py; with this one every open-table format in the repo can
be both a streaming sink and a streaming source.

Semantics at the edges:
  * UPSERT commits stream the NEW VERSION of each updated record (that
    is what Hudi incremental queries emit); insert-only pipelines get
    pure appends.
  * DELETE work (replacecommit deletes, MOR DELETE log blocks) cannot
    be represented as appended rows: the commit gates with a precise
    error unless ``skipChangeCommits=true``, in which case the commit
    is skipped whole -- the delta-spark option of the same name.
  * MOR AVRO_DATA log blocks decode through the in-repo HoodieLogFormat
    codec and stream like base-file rows.

The writer schema comes from the newest commit's
``extraMetadata.schema`` (Avro JSON, where real Hudi carries it),
mapped to Spark types WITHOUT a session (the DataSource.schema() hook
runs in a sessionless worker).

Scale posture (round 8): the default reader is a PARTITIONED
``DataSourceStreamReader`` -- the driver plans each micro-batch from
the timeline's commit metadata ONLY (never opening a base or log file)
and emits one ``InputPartition`` per write-stat file (base parquet or
log file); decode runs in ``read(partition)`` on the EXECUTORS, so
streamed bytes never funnel through the driver.
``.option("simpleReader", "true")`` opts back into the previous
``SimpleDataSourceStreamReader`` so tests can pin both faces equal.
Offsets are exact and replayable: ``partitions(start, end)`` re-plans
any (start, end] instant range deterministically, which gives the
downstream checkpoint exactly-once.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .hudi import (
    BLOCK_AVRO_DATA,
    BLOCK_DELETE,
    HEADER_INSTANT_TIME,
    HEADER_SCHEMA,
    META_COLS,
    _completed_instants,
    _decode_avro_data,
    _read_instant,
    _read_log_blocks,
)

_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


def _latest_schema(table: str) -> dict:
    """Newest commit's extraMetadata.schema (Avro record schema)."""
    for instant, action in reversed(_completed_instants(table)):
        meta = _read_instant(table, instant, action)
        sj = meta.get("extraMetadata", {}).get("schema")
        if sj:
            return json.loads(sj)
    raise ValueError(f"hudi_tail: no commit in {table!r} carries a schema")


def _avro_field_types(avro_schema: dict) -> list[tuple[str, object]]:
    """[(name, avro type node)] for the DATA columns (meta cols out)."""
    out = []
    for f in avro_schema["fields"]:
        if f["name"] in META_COLS:
            continue
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            t = next(x for x in t if x != "null")
        out.append((f["name"], t))
    return out


def _struct_fields(table: str):
    """Avro schema -> StructType without touching a SparkSession."""
    from pyspark.sql import types as T

    prim = {
        "long": T.LongType(), "int": T.IntegerType(),
        "double": T.DoubleType(), "float": T.FloatType(),
        "string": T.StringType(), "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }
    fields = []
    for name, t in _avro_field_types(_latest_schema(table)):
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "timestamp-micros":
                st = T.TimestampType()
            elif lt == "date":
                st = T.DateType()
            else:
                raise ValueError(f"hudi_tail: type {t!r} unsupported")
        elif t in prim:
            st = prim[t]
        else:
            raise ValueError(f"hudi_tail: type {t!r} unsupported")
        fields.append(T.StructField(name, st, True))
    return T.StructType(fields)


def _from_avro_value(v, t):
    """Avro wire value -> Spark row value (µs longs back to datetimes)."""
    if v is None or not isinstance(t, dict):
        return v
    lt = t.get("logicalType")
    if lt == "timestamp-micros":
        return _EPOCH + _dt.timedelta(microseconds=int(v))
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=int(v))
    return v


def _instant_payloads(table: str, instant: str, action: str,
                      skip_change: bool,
                      names_types: list[tuple]) -> list[dict]:
    """Driver-side planning for one instant: the write-stat files as
    picklable payloads -- commit METADATA only, no base/log file is
    opened here.  replacecommit / DELETE operations gate with a precise
    error unless skip_change (then the commit is skipped whole)."""
    meta = _read_instant(table, instant, action)
    op = meta.get("operationType", "")
    if action == "replacecommit" or op == "DELETE":
        if skip_change:
            return []
        raise ValueError(
            f"hudi_tail: instant {instant} ({op or action}) changes existing "
            "data; streaming a Hudi source requires append/upsert commits "
            "(set skipChangeCommits=true to skip them)"
        )
    payloads: list[dict] = []
    for stats_list in meta.get("partitionToWriteStats", {}).values():
        for st in stats_list:
            payloads.append({
                "file": os.path.join(table, st["path"]),
                "log": bool(st.get("logFile")),
                "instant": instant,
                "names_types": names_types,
                "skip_change": skip_change,
            })
    return payloads


def _payload_rows(p: dict) -> list[tuple]:
    """Executor-side decode of one write-stat file (base parquet or
    HoodieLogFormat log), filtered to rows WRITTEN at the payload's
    instant (Hudi incremental semantics).  DELETE log blocks -- only
    discoverable by reading the log content -- gate here with the same
    error the driver-side planner uses for DELETE commits."""
    import pyarrow.parquet as papq

    names_types = p["names_types"]
    names = [n for n, _t in names_types]
    instant = p["instant"]
    rows: list[tuple] = []
    if p["log"]:
        with open(p["file"], "rb") as fh:
            blob = fh.read()
        for btype, header, content in _read_log_blocks(blob):
            if header.get(HEADER_INSTANT_TIME) != instant:
                continue
            if btype == BLOCK_DELETE:
                if p["skip_change"]:
                    continue
                raise ValueError(
                    f"hudi_tail: instant {instant} carries a DELETE log "
                    "block (set skipChangeCommits=true to skip)"
                )
            if btype != BLOCK_AVRO_DATA:
                continue
            schema = json.loads(header[HEADER_SCHEMA])
            for r in _decode_avro_data(content, schema):
                if r.get("_hoodie_commit_time") != instant:
                    continue
                rows.append(
                    tuple(_from_avro_value(r.get(n), t)
                          for n, t in names_types)
                )
    else:
        tbl = papq.read_table(p["file"])
        ct = tbl.column("_hoodie_commit_time").to_pylist()
        cols = {n: tbl.column(n).to_pylist() for n in names}
        for i in range(tbl.num_rows):
            if ct[i] != instant:
                continue  # carried-over row from a CoW rewrite
            rows.append(tuple(_plain(cols[n][i]) for n in names))
    return rows


def _instant_rows(table: str, instant: str, action: str,
                  skip_change: bool) -> list[tuple]:
    """Records WRITTEN at `instant`, in schema field order (simple /
    batch face: plan + decode in one place)."""
    names_types = _avro_field_types(_latest_schema(table))
    rows: list[tuple] = []
    for p in _instant_payloads(table, instant, action, skip_change,
                               names_types):
        rows.extend(_payload_rows(p))
    return rows


def _plain(v):
    """pandas Timestamp (ns-typed parquet via Arrow) -> plain naive
    datetime, which Spark's row converter accepts."""
    return v.to_pydatetime() if hasattr(v, "to_pydatetime") else v


class HudiTailStreamReader(DataSourceStreamReader):
    """Partitioned stream reader (the default): timeline planning on
    the driver, one InputPartition per write-stat file, decode on
    executors."""

    def __init__(self, options):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("hudi_tail requires .option('table', <path>)")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.starting = str(options.get("startingInstant", ""))
        self.names_types = _avro_field_types(_latest_schema(self.table))

    def initialOffset(self):
        return {"instant": self.starting}

    def latestOffset(self):
        instants = _completed_instants(self.table)
        latest = instants[-1][0] if instants else self.starting
        return {"instant": max(latest, self.starting)}

    def partitions(self, start, end):
        parts: list[InputPartition] = []
        for t, a in _completed_instants(self.table):
            if start["instant"] < t <= end["instant"]:
                for p in _instant_payloads(
                    self.table, t, a, self.skip_change, self.names_types
                ):
                    parts.append(InputPartition(p))
        return parts or [InputPartition(None)]

    def read(self, partition):
        if partition.value is None:
            return iter(())
        return iter(_payload_rows(partition.value))

    def commit(self, end):
        pass


class HudiTailSimpleStreamReader(SimpleDataSourceStreamReader):
    """Simple (driver-side) face, behind .option('simpleReader','true')."""

    def __init__(self, options):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("hudi_tail requires .option('table', <path>)")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.starting = str(options.get("startingInstant", ""))

    def initialOffset(self):
        return {"instant": self.starting}

    def read(self, start):
        pending = [
            (t, a) for (t, a) in _completed_instants(self.table)
            if t > start["instant"]
        ]
        if not pending:
            return iter([]), start
        rows: list[tuple] = []
        for t, a in pending:
            rows.extend(_instant_rows(self.table, t, a, self.skip_change))
        return iter(rows), {"instant": pending[-1][0]}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple] = []
        for t, a in _completed_instants(self.table):
            if start["instant"] < t <= end["instant"]:
                rows.extend(_instant_rows(self.table, t, a, self.skip_change))
        return iter(rows)


class HudiTailBatchReader(DataSourceReader):
    """Batch face: the whole timeline replayed incrementally (same
    per-commit filter, so it equals the snapshot for upsert-free
    tables and the record-version history otherwise), one
    InputPartition per write-stat file."""

    def __init__(self, options):
        self.table = options.get("table")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )

    def partitions(self):
        names_types = _avro_field_types(_latest_schema(self.table))
        parts = []
        for t, a in _completed_instants(self.table):
            for p in _instant_payloads(
                self.table, t, a, self.skip_change, names_types
            ):
                parts.append(InputPartition(p))
        return parts or [InputPartition(None)]

    def read(self, partition):
        if partition.value is None:
            return iter(())
        return iter(_payload_rows(partition.value))


class HudiTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hudi_tail"

    def schema(self):
        return _struct_fields(self.options["table"])

    def reader(self, schema):
        return HudiTailBatchReader(self.options)

    def streamReader(self, schema):
        if str(self.options.get("simpleReader", "false")).lower() == "true":
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (simpleReader)"},
            )
        return HudiTailStreamReader(self.options)

    def simpleStreamReader(self, schema):
        return HudiTailSimpleStreamReader(self.options)


def register_hudi_tail(spark) -> None:
    """Idempotent registration of the hudi_tail source."""
    spark.dataSource.register(HudiTailDataSource)
