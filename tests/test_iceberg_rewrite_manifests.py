"""rewrite_manifests pins (sources/iceberg.py::iceberg_rewrite_manifests):
manifest count collapses, scans and time travel are unchanged, and --
the part a naive merge gets WRONG -- per-entry sequence numbers keep
equality-delete scoping exact after the merge."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hive_person_service_spark.sources.iceberg import (
    _load_metadata,
    _resolve,
    iceberg_delete,
    iceberg_delete_equality,
    iceberg_rewrite_manifests,
    iceberg_scan,
    iceberg_write,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _n_manifests(t):
    from pathlib import Path

    from hive_person_service_spark.sources.avro_ocf import read_ocf

    meta = _load_metadata(t)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mlist = read_ocf(Path(_resolve(t, snap["manifest-list"])).read_bytes())
    return len(mlist)


def test_rewrite_collapses_append_manifests(spark, tmp_path):
    t = _fresh(tmp_path, "rw_appends")
    for lo in range(0, 50, 10):
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(lo, lo + 10)], "id long, name string"
        )
        iceberg_write(df, t)
    old_snap = _load_metadata(t)["current-snapshot-id"]
    assert _n_manifests(t) == 5
    res = iceberg_rewrite_manifests(t)
    assert res["manifests_before"] == 5 and res["manifests_after"] == 1
    assert _n_manifests(t) == 1
    got = sorted(r["id"] for r in iceberg_scan(spark, t).collect())
    assert got == list(range(50))
    # time travel to the pre-rewrite snapshot still resolves
    prev = sorted(
        r["id"] for r in iceberg_scan(spark, t, snapshot_id=old_snap).collect()
    )
    assert prev == list(range(50))
    # a second rewrite is a no-op
    res2 = iceberg_rewrite_manifests(t)
    assert res2["manifests_after"] == res2["manifests_before"] == 1


def test_rewrite_preserves_equality_delete_scoping(spark, tmp_path):
    """File A (seq 1) -> equality delete id<5 keys (seq 2) -> file B
    re-adding id 3 (seq 3).  B's id=3 row must survive the OLDER
    equality delete.  A merge that collapsed every entry onto one
    manifest-level sequence number would either resurrect A's deleted
    rows or kill B's -- the per-entry pin keeps both exact."""
    t = _fresh(tmp_path, "rw_eqdel")
    a = spark.createDataFrame(
        [(i, f"a{i}") for i in range(10)], "id long, name string"
    )
    iceberg_write(a, t)
    keys = spark.createDataFrame([(i,) for i in range(5)], "id long")
    iceberg_delete_equality(spark, t, keys)
    b = spark.createDataFrame([(3, "b3"), (100, "b100")],
                              "id long, name string")
    iceberg_write(b, t)
    want = sorted(
        (r["id"], r["name"]) for r in iceberg_scan(spark, t).collect()
    )
    assert (3, "b3") in want and (3, "a3") not in want
    assert all(not (i, f"a{i}") in want for i in range(5))

    res = iceberg_rewrite_manifests(t)
    assert res["manifests_after"] < res["manifests_before"]
    got = sorted(
        (r["id"], r["name"]) for r in iceberg_scan(spark, t).collect()
    )
    assert got == want


def test_rewrite_preserves_position_deletes_and_later_writes(spark, tmp_path):
    t = _fresh(tmp_path, "rw_posdel")
    for lo in (0, 10):
        iceberg_write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)], "id long, v double"
            ),
            t,
        )
    iceberg_delete(spark, t, "id % 3 = 0")
    want = sorted(r["id"] for r in iceberg_scan(spark, t).collect())
    iceberg_rewrite_manifests(t)
    assert sorted(r["id"] for r in iceberg_scan(spark, t).collect()) == want
    # the table keeps working: appends after a rewrite land normally
    iceberg_write(
        spark.createDataFrame([(100, 1.0)], "id long, v double"), t
    )
    assert 100 in {r["id"] for r in iceberg_scan(spark, t).collect()}


def test_rewrite_groups_by_spec_id(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import iceberg_update_spec

    t = _fresh(tmp_path, "rw_specs")
    iceberg_write(
        spark.createDataFrame([(i, f"g{i % 2}") for i in range(10)],
                              "id long, grp string"),
        t,
        partition_spec=[{"name": "grp_p", "transform": "identity",
                         "source": "grp"}],
    )
    iceberg_update_spec(
        t, [{"name": "id_b", "transform": "bucket[4]", "source": "id"}]
    )
    iceberg_write(
        spark.createDataFrame([(i, f"g{i % 2}") for i in range(10, 20)],
                              "id long, grp string"),
        t,
    )
    res = iceberg_rewrite_manifests(t)
    # one merged manifest PER SPEC-ID (mixed-spec pruning must survive)
    assert res["manifests_after"] == 2
    got = sorted(r["id"] for r in iceberg_scan(spark, t).collect())
    assert got == list(range(20))
