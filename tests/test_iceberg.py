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
    # future format version -> precise gate
    meta_bad = dict(meta, **{"format-version": 3})
    with open(os.path.join(meta_dir, f"v{v+1}.metadata.json"), "w") as fh:
        json.dump(meta_bad, fh)
    open(hint, "w").write(str(v + 1))
    with pytest.raises(ValueError, match="format-version 3"):
        iceberg_scan(spark, t)
    # appending to a gated table must surface the gate, NOT silently
    # re-initialize the table over the newer metadata
    with pytest.raises(ValueError, match="format-version 3"):
        iceberg_write(_mk(spark, [(2, "b", 2.0)]), t)
    open(hint, "w").write(str(v))
    os.remove(os.path.join(meta_dir, f"v{v+1}.metadata.json"))
    # unknown snapshot id -> precise error
    with pytest.raises(ValueError, match="not in table log"):
        iceberg_scan(spark, t, snapshot_id=123456)
    # not-a-table error
    with pytest.raises(ValueError, match="metadata"):
        iceberg_scan(spark, str(tmp_path / "nope"))
