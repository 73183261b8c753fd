"""Minimal Apache Iceberg table reader/writer over the PUBLIC table spec
(https://iceberg.apache.org/spec/) -- the second half of the round-4
verdict's "open-table-format interop" line (Delta landed first;
sources/delta_log.py). No iceberg-spark runtime jar ships in this
container, so the metadata layer is implemented directly: JSON table
metadata + Avro manifest lists + Avro manifests, all through the in-repo
Avro OCF codec (sources/avro_ocf.py) -- the same bytes any Iceberg
client writes/reads.

Spec subset implemented:
  * ``metadata/version-hint.text`` -> ``v<N>.metadata.json`` discovery
    (falls back to the highest ``v*.metadata.json`` present);
  * format-version 1 snapshots: ``current-snapshot-id``, the snapshot's
    ``manifest-list`` Avro (one record per manifest), each manifest's
    Avro entries (``status`` 0=EXISTING 1=ADDED 2=DELETED,
    ``data_file.file_path`` / ``record_count`` / ...);
  * time travel by ``snapshot_id`` (any snapshot in the log);
  * appends: each commit writes data parquet + a new manifest + a new
    manifest list carrying ALL live manifests + ``v<N+1>.metadata.json``
    + the version hint (single-writer rename discipline).

Because Iceberg data files physically CONTAIN their partition columns,
the data path is a plain multi-file parquet scan whatever the partition
spec -- no path-derived column reattachment needed (unlike hive-style
layouts). Reader gates, each a precise ValueError: format-version > 2;
v2 delete files (``content != 0`` entries / delete manifests); ORC/Avro
data files. The metadata layer is driver-side (KBs of JSON/Avro; this
mirrors how Iceberg's own planning works), so every Catalyst pushdown
still applies to the data scan.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .avro_ocf import read_ocf, write_ocf

# ---------------------------------------------------------------------------
# metadata discovery
# ---------------------------------------------------------------------------


def _meta_dir(table: str) -> Path:
    return Path(table, "metadata")


def _current_metadata_path(table: str) -> Path:
    d = _meta_dir(table)
    if not d.is_dir():
        raise ValueError(f"not an Iceberg table (no metadata dir): {table}")
    hint = d / "version-hint.text"
    if hint.exists():
        v = int(hint.read_text().strip())
        p = d / f"v{v}.metadata.json"
        if p.exists():
            return p
    versions = sorted(
        (int(m.group(1)), p)
        for p in d.iterdir()
        if (m := re.match(r"v(\d+)\.metadata\.json$", p.name))
    )
    if not versions:
        raise ValueError(f"no v*.metadata.json under {d}")
    return versions[-1][1]


def _load_metadata(table: str) -> dict:
    meta = json.loads(_current_metadata_path(table).read_text())
    fv = meta.get("format-version", 1)
    if fv > 2:
        raise ValueError(f"Iceberg format-version {fv} unsupported (max 2)")
    return meta


def _resolve(table: str, location: str) -> str:
    """Spec paths are absolute URIs; re-root under the table dir when the
    absolute path no longer exists (relocated/copied test tables)."""
    p = location
    if p.startswith("file://"):
        p = p[len("file://"):]
    if os.path.exists(p):
        return p
    # relocated table: re-root at the metadata/ or data/ component
    for marker in ("/metadata/", "/data/"):
        if marker in p:
            return os.path.join(table, marker.strip("/"), p.split(marker, 1)[1])
    return os.path.join(table, os.path.basename(p))


# ---------------------------------------------------------------------------
# snapshot -> live data files
# ---------------------------------------------------------------------------


def _snapshot_files(table: str, meta: dict, snapshot_id: int | None) -> list[str]:
    snaps = meta.get("snapshots", [])
    if not snaps:
        return []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
    if snap is None:
        raise ValueError(f"snapshot {snapshot_id} not in table log")
    mlist_path = _resolve(table, snap["manifest-list"])
    _, mlist = read_ocf(Path(mlist_path).read_bytes())
    files: list[str] = []
    for m in mlist:
        if m.get("content", 0) not in (0, None):
            raise ValueError(
                "Iceberg v2 delete manifests unsupported by this minimal client"
            )
        man_path = _resolve(table, m["manifest_path"])
        _, entries = read_ocf(Path(man_path).read_bytes())
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED
                continue
            df_rec = e["data_file"]
            if df_rec.get("content", 0) not in (0, None):
                raise ValueError(
                    "Iceberg v2 delete files unsupported by this minimal client"
                )
            fmt = (df_rec.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise ValueError(f"Iceberg {fmt} data files unsupported")
            files.append(_resolve(table, df_rec["file_path"]))
    return sorted(set(files))


def iceberg_scan(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read an Iceberg table at the current snapshot (or ``snapshot_id``
    for time travel): metadata/manifest planning driver-side, data as a
    plain parquet scan over the live file set."""
    meta = _load_metadata(table)
    files = _snapshot_files(table, meta, snapshot_id)
    if not files:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], _schema_from_iceberg(meta))
    return spark.read.parquet(*files)


def iceberg_snapshots(table: str) -> list[dict]:
    """Snapshot log: (snapshot-id, timestamp-ms, operation)."""
    meta = _load_metadata(table)
    return [
        {
            "snapshot_id": s["snapshot-id"],
            "timestamp_ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
        }
        for s in meta.get("snapshots", [])
    ]


# ---------------------------------------------------------------------------
# schema mapping (Iceberg JSON <-> Spark)
# ---------------------------------------------------------------------------

_ICE_TO_SPARK = {
    "long": "long", "int": "integer", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "binary": "binary",
    "date": "date", "timestamp": "timestamp", "timestamptz": "timestamp",
}
_SPARK_TO_ICE = {
    "long": "long", "integer": "int", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "binary": "binary",
    "date": "date", "timestamp": "timestamp",
}


def _schema_from_iceberg(meta: dict):
    from pyspark.sql.types import StructType, _parse_datatype_string

    schema = meta.get("schema") or (meta.get("schemas") or [{}])[0]
    parts = []
    for f in schema.get("fields", []):
        t = f["type"]
        if not isinstance(t, str) or t not in _ICE_TO_SPARK:
            raise ValueError(f"Iceberg type {t!r} unsupported in minimal client")
        parts.append(f"{f['name']} {_ICE_TO_SPARK[t]}")
    return _parse_datatype_string(", ".join(parts)) if parts else StructType([])


def _schema_to_iceberg(struct) -> dict:
    fields = []
    for i, f in enumerate(struct.fields, start=1):
        name = f.dataType.typeName()
        if name not in _SPARK_TO_ICE:
            raise ValueError(f"Spark type {name} unsupported in minimal client")
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": _SPARK_TO_ICE[name],
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


# ---------------------------------------------------------------------------
# writer (v1, unpartitioned, append / overwrite)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": ["null", "int"]},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": ["null", "string"]},
                        {"name": "file_format", "type": ["null", "string"]},
                        {"name": "record_count", "type": ["null", "long"]},
                        {"name": "file_size_in_bytes", "type": ["null", "long"]},
                    ],
                },
            ],
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": ["null", "string"]},
        {"name": "manifest_length", "type": ["null", "long"]},
        {"name": "partition_spec_id", "type": ["null", "int"]},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def _write_parquet_files(df: DataFrame, table: str) -> list[dict]:
    sub = os.path.join(table, "data", f"commit-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(sub)
    out = []
    for root, _dirs, names in os.walk(sub):
        for n in names:
            if n.endswith(".parquet"):
                full = os.path.join(root, n)
                out.append(
                    {
                        "file_path": full,
                        "file_format": "PARQUET",
                        "record_count": None,
                        "file_size_in_bytes": os.path.getsize(full),
                    }
                )
    success = os.path.join(sub, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    return out


def iceberg_write(df: DataFrame, table: str, mode: str = "append") -> int:
    """Commit df to an Iceberg v1 table (append/overwrite); creates the
    table on first commit. Returns the new snapshot id."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    d = _meta_dir(table)
    d.mkdir(parents=True, exist_ok=True)
    # Create-new ONLY when no metadata exists; an existing table whose
    # metadata is unreadable (e.g. future format-version) must surface its
    # gate, not be silently re-initialized over.
    has_meta = any(re.match(r"v\d+\.metadata\.json$", p.name) for p in d.iterdir())
    if has_meta:
        meta = _load_metadata(table)
        version = int(_current_metadata_path(table).stem[1:].split(".")[0])
    else:
        meta = {
            "format-version": 1,
            "table-uuid": uuid.uuid4().hex,
            "location": table,
            "last-updated-ms": 0,
            "last-column-id": len(df.schema.fields),
            "schema": _schema_to_iceberg(df.schema),
            "partition-spec": [],
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "properties": {},
            "snapshots": [],
            "current-snapshot-id": -1,
        }
        version = 0

    snapshot_id = int(time.time() * 1000) * 1000 + version + 1
    adds = _write_parquet_files(df, table)
    entries = [
        {"status": 1, "snapshot_id": snapshot_id, "data_file": a} for a in adds
    ]
    man_path = str(d / f"manifest-{uuid.uuid4().hex[:12]}.avro")
    Path(man_path).write_bytes(write_ocf(entries, _MANIFEST_SCHEMA))

    manifests = [
        {
            "manifest_path": man_path,
            "manifest_length": os.path.getsize(man_path),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
        }
    ]
    if mode == "append" and meta.get("current-snapshot-id", -1) != -1:
        cur = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, prev = read_ocf(Path(_resolve(table, cur["manifest-list"])).read_bytes())
        manifests.extend(prev)
    mlist_path = str(d / f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro")
    Path(mlist_path).write_bytes(write_ocf(manifests, _MANIFEST_LIST_SCHEMA))

    meta["snapshots"] = meta.get("snapshots", []) + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": int(time.time() * 1000),
            "manifest-list": mlist_path,
            "summary": {"operation": mode},
        }
    ]
    meta["current-snapshot-id"] = snapshot_id
    meta["last-updated-ms"] = int(time.time() * 1000)
    new_version = version + 1
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(meta, indent=1))
    os.rename(tmp, d / f"v{new_version}.metadata.json")
    (d / "version-hint.text").write_text(str(new_version))
    return snapshot_id
