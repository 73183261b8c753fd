"""Behavioral pins for the minimal Iceberg spec client
(sources/iceberg.py): snapshot planning across appends, overwrite,
time travel by snapshot id, version-hint discovery + highest-version
fallback, relocated-table path re-rooting, and the v2/delete gates."""

from __future__ import annotations

import json
import os
import shutil

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def test_iceberg_append_overwrite_time_travel(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "t")
    s0 = iceberg_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    s1 = iceberg_write(_mk(spark, [(3, "a", 3.0)]), t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {1, 2, 3}
    # time travel to the first snapshot
    assert {r.id for r in iceberg_scan(spark, t, snapshot_id=s0).collect()} == {1, 2}
    # overwrite starts a fresh file set
    s2 = iceberg_write(_mk(spark, [(9, "c", 9.0)]), t, mode="overwrite")
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {9}
    # older snapshots still reconstruct
    assert {r.id for r in iceberg_scan(spark, t, snapshot_id=s1).collect()} == {1, 2, 3}
    log = iceberg_snapshots(t)
    assert [s["snapshot_id"] for s in log] == [s0, s1, s2]
    assert log[-1]["operation"] == "overwrite"


def test_iceberg_version_discovery_and_relocation(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "src")
    iceberg_write(_mk(spark, [(1, "a", 1.0)]), t)
    iceberg_write(_mk(spark, [(2, "b", 2.0)]), t)
    # without the hint, the highest v*.metadata.json wins
    os.remove(os.path.join(t, "metadata", "version-hint.text"))
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {1, 2}
    # a COPIED table (absolute spec paths now dangle) re-roots and reads
    t2 = str(tmp_path / "copy")
    shutil.copytree(t, t2)
    shutil.rmtree(t)
    assert {r.id for r in iceberg_scan(spark, t2).collect()} == {1, 2}


def test_iceberg_gates(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "g")
    iceberg_write(_mk(spark, [(1, "a", 1.0)]), t)
    meta_dir = os.path.join(t, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    v = int(open(hint).read())
    mpath = os.path.join(meta_dir, f"v{v}.metadata.json")
    meta = json.load(open(mpath))
    # future format version -> precise gate (v3 DVs supported since r6,
    # so the gate now sits at >3)
    meta_bad = dict(meta, **{"format-version": 4})
    with open(os.path.join(meta_dir, f"v{v+1}.metadata.json"), "w") as fh:
        json.dump(meta_bad, fh)
    open(hint, "w").write(str(v + 1))
    with pytest.raises(ValueError, match="format-version 4"):
        iceberg_scan(spark, t)
    # appending to a gated table must surface the gate, NOT silently
    # re-initialize the table over the newer metadata
    with pytest.raises(ValueError, match="format-version 4"):
        iceberg_write(_mk(spark, [(2, "b", 2.0)]), t)
    open(hint, "w").write(str(v))
    os.remove(os.path.join(meta_dir, f"v{v+1}.metadata.json"))
    # unknown snapshot id -> precise error
    with pytest.raises(ValueError, match="not in table log"):
        iceberg_scan(spark, t, snapshot_id=123456)
    # not-a-table error
    with pytest.raises(ValueError, match="metadata"):
        iceberg_scan(spark, str(tmp_path / "nope"))


def test_iceberg_v2_position_deletes(spark, tmp_path):
    """Row-level DELETE as v2 position deletes: data files untouched, a
    delete manifest + parquet delete file appear, the scan drops exactly
    the deleted positions, deletes MERGE across commits (second delete
    sees the first), re-delete is a no-op, and time travel to the
    pre-delete snapshot still sees every row."""
    import os

    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "v2del")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(100)],
        "id long, grp string, v double",
    )
    iceberg_write(df, t)
    pre_snapshot = iceberg_snapshots(t)[-1]["snapshot_id"]
    data_files_before = sorted(
        os.path.join(r, n)
        for r, _, ns in os.walk(os.path.join(t, "data"))
        for n in ns
        if n.endswith(".parquet")
    )
    assert iceberg_delete(spark, t, "id % 10 = 0") == 10
    # original data files byte-identical (merge-on-read, no rewrite)
    for p in data_files_before:
        assert os.path.exists(p)
    got = iceberg_scan(spark, t)
    assert got.count() == 90
    assert {r.id for r in got.where("id < 25").collect()} == (
        set(range(25)) - {0, 10, 20}
    )
    # second delete merges (positions computed against LIVE rows)
    assert iceberg_delete(spark, t, "id % 10 = 5") == 10
    assert iceberg_scan(spark, t).count() == 80
    assert iceberg_delete(spark, t, "id % 10 = 0") == 0  # no-op re-delete
    # time travel to the pre-delete snapshot sees everything
    assert iceberg_scan(spark, t, snapshot_id=pre_snapshot).count() == 100
    # metadata upgraded to v2
    import json as _json
    metas = sorted(
        n for n in os.listdir(os.path.join(t, "metadata"))
        if n.endswith(".metadata.json")
    )
    latest = _json.loads(
        open(os.path.join(t, "metadata", metas[-1])).read()
    )
    assert latest["format-version"] == 2
    # appends still work after the delete commit (manifests carried)
    iceberg_write(
        spark.createDataFrame([(999, "z", 9.9)], "id long, grp string, v double"),
        t,
        mode="append",
    )
    assert iceberg_scan(spark, t).count() == 81


def test_iceberg_equality_delete_basic(spark, tmp_path):
    """content=2 delete file + equality_ids removes every row matching a
    key row on the equality columns; non-matching rows untouched."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete_equality,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "eq")
    iceberg_write(
        _mk(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0), (4, "c", 4.0)]),
        t,
    )
    n = iceberg_delete_equality(
        spark, t, spark.createDataFrame([("a",), ("c",)], "grp string")
    )
    assert n == 2
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {2}


def test_iceberg_equality_delete_strict_sequence(spark, tmp_path):
    """The spec's strict rule: an equality delete applies ONLY to data
    files with a smaller data sequence number, so re-appending a deleted
    key (the CDC upsert pattern) survives — and a SECOND delete at a
    higher sequence number removes it again."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete_equality,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "eqseq")
    iceberg_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    keys = spark.createDataFrame([("a",)], "grp string")
    iceberg_delete_equality(spark, t, keys)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {2}
    # upsert: new image of the 'a' row lands AFTER the delete
    iceberg_write(_mk(spark, [(10, "a", 10.0)]), t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {2, 10}
    # a fresh delete at a higher seq removes the new image too
    iceberg_delete_equality(spark, t, keys)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {2}


def test_iceberg_equality_delete_multi_column_and_nulls(spark, tmp_path):
    """Multi-column equality keys match null-safely (NULL key deletes
    NULL rows — Iceberg equality semantics, not SQL three-valued)."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete_equality,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "eqnull")
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, None, 3.0), (4, "b", 1.0)]
    iceberg_write(_mk(spark, rows), t)
    keys = spark.createDataFrame([("a", 1.0), (None, 3.0)], "grp string, v double")
    iceberg_delete_equality(spark, t, keys)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {2, 4}


def test_iceberg_equality_delete_time_travel_and_mix(spark, tmp_path):
    """Pre-delete snapshots still see every row; equality + position
    deletes compose in one live view."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_delete_equality,
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "eqmix")
    iceberg_write(
        _mk(spark, [(1, "a", 1.0), (2, "b", -2.0), (3, "c", 3.0), (4, "a", 4.0)]),
        t,
    )
    iceberg_delete_equality(spark, t, spark.createDataFrame([("a",)], "grp string"))
    iceberg_delete(spark, t, "v < 0")
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {3}
    first = iceberg_snapshots(t)[0]["snapshot_id"]
    assert len(iceberg_scan(spark, t, snapshot_id=first).collect()) == 4


def test_iceberg_equality_delete_gates(spark, tmp_path):
    """Precise errors: unknown key column; delete entry missing
    equality_ids (a malformed/foreign manifest)."""
    import pytest as _pytest

    from hive_person_service_spark.sources.avro_ocf import read_ocf, write_ocf
    from hive_person_service_spark.sources.iceberg import (
        _MANIFEST_SCHEMA,
        iceberg_delete_equality,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "eqgate")
    iceberg_write(_mk(spark, [(1, "a", 1.0)]), t)
    with _pytest.raises(ValueError, match="not in table schema"):
        iceberg_delete_equality(
            spark, t, spark.createDataFrame([(1,)], "nope int")
        )
    # hand-craft a content=2 entry with no equality_ids into the manifest
    import os
    from pathlib import Path

    mdir = os.path.join(t, "metadata")
    man = next(
        os.path.join(mdir, n) for n in os.listdir(mdir)
        if n.startswith("manifest-")
    )
    _, entries = read_ocf(Path(man).read_bytes())
    entries.append(
        {
            "status": 1,
            "snapshot_id": 1,
            "data_file": {
                "content": 2,
                "file_path": "/nope/eq-delete.parquet",
                "file_format": "PARQUET",
                "record_count": 1,
                "file_size_in_bytes": 10,
                "equality_ids": None,
            },
        }
    )
    Path(man).write_bytes(write_ocf(entries, _MANIFEST_SCHEMA))
    with _pytest.raises(ValueError, match="without equality_ids"):
        iceberg_scan(spark, t).collect()


def test_iceberg_compact_and_expire(spark, tmp_path):
    """rewrite_data_files folds position deletes into a clean snapshot
    (content invariant, delete files no longer consulted);
    expire_snapshots drops old snapshots and orphan-cleans their files,
    after which time travel to an expired snapshot raises."""
    import os

    import pytest as _pytest

    from hive_person_service_spark.sources.iceberg import (
        iceberg_compact,
        iceberg_delete,
        iceberg_expire_snapshots,
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "maint")
    for i in range(3):
        iceberg_write(
            spark.createDataFrame(
                [(i * 10 + j, float(j)) for j in range(10)], "id long, v double"
            ),
            t,
            mode="append",
        )
    iceberg_delete(spark, t, "id % 10 < 2")  # 6 rows out
    before = {r.id for r in iceberg_scan(spark, t).collect()}
    assert len(before) == 24
    first_snapshot = iceberg_snapshots(t)[0]["snapshot_id"]

    stats = iceberg_compact(spark, t, target_files=1)
    assert stats["files_before"] >= 4
    assert {r.id for r in iceberg_scan(spark, t).collect()} == before
    # pre-compaction snapshots still time-travelable
    assert iceberg_scan(spark, t, snapshot_id=first_snapshot).count() == 10

    res = iceberg_expire_snapshots(spark, t, keep_last=1)
    assert res["expired"] >= 4
    assert res["files_deleted"] > 0
    assert {r.id for r in iceberg_scan(spark, t).collect()} == before
    with _pytest.raises(ValueError, match="not in table log"):
        iceberg_scan(spark, t, snapshot_id=first_snapshot)
