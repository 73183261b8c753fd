"""Metadata-only table-format conversion between the two lakehouse
clients -- the public "Delta UniForm" / "CONVERT TO DELTA" surface:
because Delta and Iceberg both track immutable parquet data files from a
metadata tier, a table in one format becomes readable in the other by
writing ONLY new metadata that references the SAME data files. No byte
of data moves -- the whole conversion is KBs of JSON/Avro, which is what
makes UniForm viable on 100 TB tables.

* ``iceberg_from_delta(table)`` writes Iceberg metadata
  (``<table>/metadata/``) next to the Delta log for the CURRENT Delta
  snapshot; re-running after new Delta commits appends a fresh Iceberg
  snapshot (UniForm's incremental sync shape: unchanged files carry
  forward, new files append, removed files drop via overwrite
  semantics).
* ``delta_from_iceberg(table)`` writes a Delta log (``_delta_log/``)
  for the current Iceberg snapshot -- the ``CONVERT TO DELTA`` shape.

Both directions gate precisely on state that cannot be represented
metadata-only in the target (the same limitations the production
implementations document):

* live row-level deletes (Delta DVs / Iceberg position-equality deletes
  or v3 DVs) -- the other format's reader would resurrect the deleted
  rows; compact first (``delta_optimize`` / ``iceberg_compact``);
* hive-partitioned Delta layouts -- Delta data files do NOT physically
  contain partition columns, Iceberg data files must;
* column mapping -- physical col-<n> names would leak.

Iceberg->Delta converts identity-partitioned tables fine (Iceberg files
physically carry every column; the result is an unpartitioned Delta
table over the same bytes).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from .avro_ocf import write_ocf
from .delta_log import _cm_phys_map, _commit, _file_stats_json, _snapshot
from .iceberg import (
    _DATA_FILE_DEFAULTS,
    _MANIFEST_LIST_SCHEMA,
    _MANIFEST_SCHEMA,
    _current_metadata_path,
    _load_metadata,
    _meta_dir,
    _plan_snapshot,
    _schema_from_iceberg,
    _schema_to_iceberg,
)


def iceberg_from_delta(table: str) -> int:
    """Make the Delta table at ``table`` readable as an Iceberg table
    (UniForm): write ``<table>/metadata/`` referencing the Delta
    snapshot's live data files verbatim. Returns the Iceberg snapshot id.
    Idempotent per Delta version: re-running without new Delta commits
    appends a snapshot with the identical file set."""
    from pyspark.sql.types import StructType

    files, meta, proto, snap_v = _snapshot(table)
    if any(a.get("deletionVector") for a in files.values()):
        raise ValueError(
            "UniForm conversion with live deletion vectors is not "
            "representable metadata-only (Iceberg readers would resurrect "
            "deleted rows); run delta_optimize first"
        )
    if meta.get("partitionColumns"):
        raise ValueError(
            "hive-partitioned Delta layouts cannot convert metadata-only: "
            "Delta data files do not physically contain partition columns, "
            "Iceberg data files must"
        )
    if _cm_phys_map(meta):
        raise ValueError(
            "column-mapped Delta tables cannot convert metadata-only "
            "(physical col-<n> names would leak into the Iceberg schema)"
        )
    struct = StructType.fromJson(json.loads(meta["schemaString"]))

    d = _meta_dir(table)
    d.mkdir(parents=True, exist_ok=True)
    has_meta = any(
        p.name.endswith(".metadata.json") and p.name.startswith("v")
        for p in d.iterdir()
    )
    if has_meta:
        ice = _load_metadata(table)
        version = int(_current_metadata_path(table).stem[1:].split(".")[0])
    else:
        ice = {
            "format-version": 1,
            "table-uuid": uuid.uuid4().hex,
            "location": table,
            "last-updated-ms": 0,
            "last-column-id": len(struct.fields),
            "schema": _schema_to_iceberg(struct),
            "partition-spec": [],
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "properties": {"converted-from": "delta"},
            "snapshots": [],
            "current-snapshot-id": -1,
        }
        version = 0

    snapshot_id = int(time.time() * 1000) * 1000 + version + 1
    seq = int(ice.get("last-sequence-number") or 0) + 1
    entries = []
    for rel, add in sorted(files.items()):
        full = os.path.join(table, rel)
        num = None
        if add.get("stats"):
            num = json.loads(add["stats"]).get("numRecords")
        if num is None:
            import pyarrow.parquet as papq

            num = papq.read_metadata(full).num_rows
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 0,
                    "file_path": full,
                    "file_format": "PARQUET",
                    "record_count": int(num),
                    "file_size_in_bytes": int(
                        add.get("size") or os.path.getsize(full)
                    ),
                    "equality_ids": None,
                    **_DATA_FILE_DEFAULTS,
                },
            }
        )
    man_path = str(d / f"manifest-{uuid.uuid4().hex[:12]}.avro")
    Path(man_path).write_bytes(write_ocf(entries, _MANIFEST_SCHEMA))
    manifests = [
        {
            "manifest_path": man_path,
            "manifest_length": os.path.getsize(man_path),
            "partition_spec_id": 0,
            "content": 0,
            "added_snapshot_id": snapshot_id,
            "sequence_number": seq,
        }
    ]
    # overwrite semantics: the converted snapshot IS the Delta snapshot;
    # no carry-forward (files removed in Delta must drop here too)
    mlist_path = str(d / f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro")
    Path(mlist_path).write_bytes(write_ocf(manifests, _MANIFEST_LIST_SCHEMA))
    ice["last-sequence-number"] = seq
    ice["snapshots"] = ice.get("snapshots", []) + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": int(time.time() * 1000),
            "manifest-list": mlist_path,
            "summary": {"operation": "overwrite", "delta-version": str(snap_v)},
        }
    ]
    ice["current-snapshot-id"] = snapshot_id
    ice["last-updated-ms"] = int(time.time() * 1000)
    new_version = version + 1
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(ice, indent=1))
    os.rename(tmp, d / f"v{new_version}.metadata.json")
    (d / "version-hint.text").write_text(str(new_version))
    return snapshot_id


def delta_from_iceberg(table: str) -> int:
    """``CONVERT TO DELTA`` for the Iceberg table at ``table``: write a
    ``_delta_log/`` whose version-0 commit references the current
    snapshot's data files verbatim (with footer-derived per-file stats,
    so Delta data skipping works immediately). Returns the Delta version
    (always 0 -- conversion refuses to clobber an existing log)."""
    if (Path(table) / "_delta_log").exists():
        raise ValueError(f"_delta_log already exists at {table}")
    meta = _load_metadata(table)
    plan = _plan_snapshot(table, meta, None)
    if plan["pos"] or plan["eq"] or plan["dv"]:
        raise ValueError(
            "Iceberg tables with live row-level deletes cannot convert "
            "metadata-only (the Delta reader would resurrect deleted "
            "rows); run iceberg_compact first"
        )
    if len(meta.get("schemas") or []) > 1:
        raise ValueError(
            "schema-evolved Iceberg tables cannot convert metadata-only: "
            "old data files resolve columns by parquet FIELD ID, which "
            "the converted Delta log would not carry; rewrite "
            "(iceberg_compact) first"
        )
    struct = _schema_from_iceberg(meta)
    actions: list[dict] = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
        },
        {
            "metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(struct.jsonValue()),
                "partitionColumns": [],
                "configuration": {"converted-from": "iceberg"},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    root = os.path.abspath(table)
    for full, _seq, _info in plan["data"]:
        full_abs = os.path.abspath(full)
        if not full_abs.startswith(root + os.sep):
            raise ValueError(
                f"data file outside the table root cannot become a "
                f"relative Delta path: {full}"
            )
        rel = os.path.relpath(full_abs, root)
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(full_abs),
                    "modificationTime": int(os.path.getmtime(full_abs) * 1000),
                    "dataChange": True,
                    "stats": _file_stats_json(full_abs),
                }
            }
        )
    _commit(table, 0, actions)
    return 0
