"""Streaming FROM a Delta table: a Spark 4 Python DataSource whose
stream offsets are LOG VERSIONS -- ``spark.readStream.format("delta_tail")
.option("table", path)`` tails the commit log, serving each micro-batch
from the versions committed since the last offset (the delta-spark
streaming-source contract: append commits stream through; commits that
CHANGE existing data fail the stream unless ``skipChangeCommits`` is
set, exactly delta-spark's option of the same name).

Scale note: this uses SimpleDataSourceStreamReader, whose batch rows
materialize in the driver-side reader (the documented Spark contract
for the simple API) -- right for control-plane-size tails and for
pinning semantics; a partitioned DataSourceStreamReader serving file
splits is the drop-in upgrade path at volume. Offsets are exact and
replayable: readBetweenOffsets re-serves any (start, end] version range
deterministically, which is what gives the downstream checkpoint
exactly-once.

Rows are decoded with pyarrow straight from the add-actions' parquet
(deletion-vector-free by the append-only contract); hive partition
columns re-attach from each add's partitionValues, typed from
schemaString.
"""

from __future__ import annotations

import json
import os
from datetime import date

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _log_versions(table: str) -> list[int]:
    d = os.path.join(table, "_delta_log")
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and n[:-5].isdigit():
            out.append(int(n[:-5]))
    return sorted(out)


def _read_version_actions(table: str, v: int) -> list[dict]:
    p = os.path.join(table, "_delta_log", f"{v:020d}.json")
    with open(p, encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _table_schema_fields(table: str) -> list[dict]:
    for v in _log_versions(table):
        for a in _read_version_actions(table, v):
            if "metaData" in a:
                return json.loads(a["metaData"]["schemaString"])["fields"]
    raise ValueError(f"no metaData action found in {table}")


def _typed_partition(raw: str | None, spark_type: str):
    if raw in (None, "__HIVE_DEFAULT_PARTITION__"):
        return None
    if spark_type in ("long", "integer", "short", "byte"):
        return int(raw)
    if spark_type in ("double", "float"):
        return float(raw)
    if spark_type == "boolean":
        return raw == "true"
    if spark_type == "date":
        return date.fromisoformat(raw)
    return raw


def _version_rows(table: str, v: int, fields: list[dict],
                  skip_change: bool) -> list[tuple]:
    """All rows ADDED at version v, in schema field order. A commit that
    changes existing data (remove actions or deletion vectors) raises
    unless skip_change, in which case it is skipped whole -- the
    delta-spark semantics."""
    import pyarrow.parquet as papq

    actions = _read_version_actions(table, v)
    changes_existing = any(
        "remove" in a
        or ("add" in a and a["add"].get("deletionVector"))
        for a in actions
    )
    if changes_existing:
        if skip_change:
            return []
        raise ValueError(
            f"delta_tail: version {v} changes existing data; streaming a "
            "Delta source requires append-only commits "
            "(set skipChangeCommits=true to skip them)"
        )
    rows: list[tuple] = []
    names = [f["name"] for f in fields]
    type_of = {
        f["name"]: f["type"] if isinstance(f["type"], str) else "complex"
        for f in fields
    }
    for a in actions:
        add = a.get("add")
        if not add or not add.get("dataChange", True):
            continue
        full = os.path.join(table, add["path"])
        tbl = papq.read_table(full)
        pv = add.get("partitionValues") or {}
        file_cols = set(tbl.column_names)
        cols = {
            n: tbl.column(n).to_pylist() if n in file_cols else None
            for n in names
        }
        n_rows = tbl.num_rows
        part_vals = {
            n: _typed_partition(pv.get(n), type_of[n])
            for n in names
            if n not in file_cols
        }
        for i in range(n_rows):
            rows.append(
                tuple(
                    cols[n][i] if cols[n] is not None else part_vals[n]
                    for n in names
                )
            )
    return rows


class DeltaTailStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("delta_tail requires .option('table', <path>)")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.starting = int(options.get("startingVersion", "0"))
        # default: drain ALL pending versions in one micro-batch --
        # SimpleDataSourceStreamReader takes a single batch under
        # Trigger.AvailableNow (the repo-documented fallback), so a
        # too-small cap would truncate availableNow drains; lower it
        # (the maxFilesPerTrigger analog) only with a processing-time
        # trigger + run_stream_until_idle
        self.max_versions = int(options.get("maxVersionsPerBatch", "1000000"))
        self.fields = _table_schema_fields(self.table)

    def initialOffset(self):
        return {"version": self.starting - 1}

    def read(self, start):
        pending = [
            v for v in _log_versions(self.table) if v > start["version"]
        ][: self.max_versions]
        if not pending:
            return iter([]), start
        rows: list[tuple] = []
        for v in pending:
            rows.extend(
                _version_rows(self.table, v, self.fields, self.skip_change)
            )
        return iter(rows), {"version": pending[-1]}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple] = []
        for v in _log_versions(self.table):
            if start["version"] < v <= end["version"]:
                rows.extend(
                    _version_rows(self.table, v, self.fields, self.skip_change)
                )
        return iter(rows)


class DeltaTailBatchReader(DataSourceReader):
    """Batch face: the whole log replayed append-only (same contract)."""

    def __init__(self, options):
        self.table = options.get("table")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.fields = _table_schema_fields(self.table)

    def read(self, partition):
        for v in _log_versions(self.table):
            yield from _version_rows(
                self.table, v, self.fields, self.skip_change
            )


class DeltaTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_tail"

    def schema(self):
        fields = _table_schema_fields(self.options["table"])
        return StructType.fromJson({"type": "struct", "fields": fields})

    def reader(self, schema):
        return DeltaTailBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return DeltaTailStreamReader(self.options)


def register_delta_tail(spark) -> None:
    """Idempotent registration of the delta_tail source."""
    spark.dataSource.register(DeltaTailDataSource)


# ---------------------------------------------------------------------------
# Iceberg twin: tail an Iceberg table's snapshot log. Offsets are the
# POSITION in the snapshot log (not snapshot ids, which are not
# monotonic); each batch serves the data files FIRST REFERENCED by the
# pending snapshots. Append snapshots stream through; snapshots that
# drop files or add delete files gate precisely unless
# skipChangeCommits. Same simple-reader scale posture as delta_tail.
# ---------------------------------------------------------------------------


def _ice_meta(table: str) -> dict:
    from .iceberg import _load_metadata

    return _load_metadata(table)


def _ice_schema_fields(table: str):
    """Iceberg schema -> StructType WITHOUT _parse_datatype_string (the
    DataSource.schema() hook runs in a sessionless Python worker)."""
    from pyspark.sql import types as T

    from .iceberg import _current_schema

    type_map = {
        "long": T.LongType(), "int": T.IntegerType(),
        "double": T.DoubleType(), "float": T.FloatType(),
        "string": T.StringType(), "boolean": T.BooleanType(),
        "binary": T.BinaryType(), "date": T.DateType(),
        "timestamp": T.TimestampType(), "timestamptz": T.TimestampType(),
    }
    fields = []
    for f in _current_schema(_ice_meta(table)).get("fields", []):
        t = f["type"]
        if not isinstance(t, str) or t not in type_map:
            raise ValueError(f"iceberg_tail: type {t!r} unsupported")
        fields.append(T.StructField(f["name"], type_map[t], True))
    return T.StructType(fields)


def _ice_snapshot_files(table: str, idx: int) -> tuple[set, set]:
    """(data file paths, delete file paths) at snapshot index idx."""
    from .iceberg import _plan_snapshot

    meta = _ice_meta(table)
    snaps = meta.get("snapshots", [])
    if idx < 0:
        return set(), set()
    sid = snaps[idx]["snapshot-id"]
    plan = _plan_snapshot(table, meta, sid)
    return (
        {p for p, _s, _i in plan["data"]},
        set(plan["pos"])
        | {p for p, _k, _s in plan["eq"]}
        # v3 DVs: identity is (puffin file, blob offset) -- a replaced DV
        # for an existing data file is a change commit like any delete
        | {f"{pf}@{off}" for pf, off, _sz, _sq in plan["dv"].values()},
    )


def _ice_version_rows(table: str, idx: int, names: list[str],
                      skip_change: bool) -> list[tuple]:
    import pyarrow.parquet as papq

    prev_data, prev_del = _ice_snapshot_files(table, idx - 1)
    cur_data, cur_del = _ice_snapshot_files(table, idx)
    dropped = prev_data - cur_data
    new_dels = cur_del - prev_del
    if dropped or new_dels:
        if skip_change:
            return []
        raise ValueError(
            f"iceberg_tail: snapshot index {idx} changes existing data; "
            "streaming an Iceberg source requires append-only snapshots "
            "(set skipChangeCommits=true to skip them)"
        )
    rows: list[tuple] = []
    for path in sorted(cur_data - prev_data):
        tbl = papq.read_table(path)
        file_cols = set(tbl.column_names)
        cols = {
            n: tbl.column(n).to_pylist() if n in file_cols else None
            for n in names
        }
        for i in range(tbl.num_rows):
            rows.append(
                tuple(
                    cols[n][i] if cols[n] is not None else None
                    for n in names
                )
            )
    return rows


class IcebergTailStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("iceberg_tail requires .option('table', <path>)")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.names = [f.name for f in _ice_schema_fields(self.table).fields]

    def initialOffset(self):
        return {"index": -1}

    def _n_snaps(self) -> int:
        return len(_ice_meta(self.table).get("snapshots", []))

    def read(self, start):
        n = self._n_snaps()
        if start["index"] >= n - 1:
            return iter([]), start
        rows: list[tuple] = []
        for idx in range(start["index"] + 1, n):
            rows.extend(
                _ice_version_rows(self.table, idx, self.names,
                                  self.skip_change)
            )
        return iter(rows), {"index": n - 1}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple] = []
        for idx in range(start["index"] + 1, end["index"] + 1):
            rows.extend(
                _ice_version_rows(self.table, idx, self.names,
                                  self.skip_change)
            )
        return iter(rows)


class IcebergTailBatchReader(DataSourceReader):
    def __init__(self, options):
        self.table = options.get("table")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.names = [f.name for f in _ice_schema_fields(self.table).fields]

    def read(self, partition):
        n = len(_ice_meta(self.table).get("snapshots", []))
        for idx in range(n):
            yield from _ice_version_rows(
                self.table, idx, self.names, self.skip_change
            )


class IcebergTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_tail"

    def schema(self):
        return _ice_schema_fields(self.options["table"])

    def reader(self, schema):
        return IcebergTailBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return IcebergTailStreamReader(self.options)


def register_iceberg_tail(spark) -> None:
    """Idempotent registration of the iceberg_tail source."""
    spark.dataSource.register(IcebergTailDataSource)
