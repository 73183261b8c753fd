"""Behavioral pins for metadata-only format conversion
(sources/convert.py): UniForm Delta->Iceberg (first contact + resync,
zero data-file copies, DV/partition/column-mapping gates) and
CONVERT TO DELTA (Iceberg->Delta, stats carried, delete/clobber gates)."""

from __future__ import annotations

import os

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _parquet_set(root: str) -> set:
    out = set()
    for dirpath, _dirs, names in os.walk(root):
        if "_delta_log" in dirpath or "/metadata" in dirpath:
            continue
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out.add((os.path.relpath(p, root), os.path.getsize(p),
                         os.path.getmtime(p)))
    return out


def test_uniform_delta_to_iceberg_resync(spark, tmp_path):
    from hive_person_service_spark.sources.convert import iceberg_from_delta
    from hive_person_service_spark.sources.delta_log import delta_write
    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_snapshots,
    )

    t = str(tmp_path / "t")
    delta_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, mode="append")
    iceberg_from_delta(t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {1, 2}
    before = _parquet_set(t)

    # resync after a second Delta commit: new files appear, nothing copied
    delta_write(_mk(spark, [(3, "c", 3.0)]), t, mode="append")
    iceberg_from_delta(t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {1, 2, 3}
    # all original parquet untouched (same rel path, size, mtime)
    assert before <= _parquet_set(t)
    # overwrite in Delta drops files from the converted snapshot too
    delta_write(_mk(spark, [(9, "z", 9.0)]), t, mode="overwrite")
    iceberg_from_delta(t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {9}
    assert len(iceberg_snapshots(t)) == 3


def test_uniform_gates(spark, tmp_path):
    from hive_person_service_spark.sources.convert import iceberg_from_delta
    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_write,
    )

    t = str(tmp_path / "dv")
    delta_write(_mk(spark, [(i, "g", 1.0) for i in range(6)]), t, mode="append")
    delta_delete(spark, t, "id < 2")
    with pytest.raises(ValueError, match="deletion vectors"):
        iceberg_from_delta(t)

    t2 = str(tmp_path / "part")
    delta_write(
        _mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t2, mode="append",
        partition_by=["grp"],
    )
    with pytest.raises(ValueError, match="partition"):
        iceberg_from_delta(t2)


def test_convert_to_delta(spark, tmp_path):
    from hive_person_service_spark.sources.convert import delta_from_iceberg
    from hive_person_service_spark.sources.delta_log import delta_scan
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_write,
    )

    t = str(tmp_path / "t")
    iceberg_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    iceberg_write(_mk(spark, [(3, "c", 3.0)]), t)
    before = _parquet_set(t)
    assert delta_from_iceberg(t) == 0
    assert {r.id for r in delta_scan(spark, t).collect()} == {1, 2, 3}
    assert _parquet_set(t) == before  # nothing moved or rewritten
    # stats made it into the add actions (numRecords present)
    import json

    log = os.path.join(t, "_delta_log", "00000000000000000000.json")
    adds = [
        json.loads(line)["add"]
        for line in open(log)
        if line.strip() and "add" in json.loads(line)
    ]
    assert adds and all(
        json.loads(a["stats"]).get("numRecords") is not None for a in adds
    )
    # refuses to clobber an existing log
    with pytest.raises(ValueError, match="_delta_log already exists"):
        delta_from_iceberg(t)

    # row-level deletes gate
    t2 = str(tmp_path / "del")
    iceberg_write(_mk(spark, [(i, "g", 1.0) for i in range(6)]), t2)
    iceberg_delete(spark, t2, "id = 0")
    with pytest.raises(ValueError, match="row-level deletes"):
        delta_from_iceberg(t2)


def test_convert_to_delta_schema_evolution_gate(spark, tmp_path):
    from hive_person_service_spark.sources.convert import delta_from_iceberg
    from hive_person_service_spark.sources.iceberg import (
        iceberg_alter,
        iceberg_write,
    )

    t = str(tmp_path / "t")
    iceberg_write(_mk(spark, [(1, "a", 1.0)]), t)
    iceberg_alter(t, rename_columns={"grp": "bucket"})
    iceberg_write(
        spark.createDataFrame([(2, "b", 2.0)], "id long, bucket string, v double"),
        t,
    )
    with pytest.raises(ValueError, match="schema-evolved"):
        delta_from_iceberg(t)
