import os
import shutil
import pytest
from hive_person_service_spark.sources.delta_log import (
    delta_changes, delta_cleanup_log, delta_delete, delta_history, delta_scan,
    delta_vacuum, delta_write, write_checkpoint_v2, _checkpoint_tombstones,
    _list_versions,
)

def _fresh(tmp_path, name):
    p = str(tmp_path / name); shutil.rmtree(p, ignore_errors=True); return p

def _four_appends(spark, t):
    for lo in range(0, 40, 10):
        delta_write(spark.createDataFrame(
            [(i, float(i)) for i in range(lo, lo+10)], "id long, v double"), t)

def test_cleanup_log_truncates_safely(spark, tmp_path):
    t = _fresh(tmp_path, "dlog")
    _four_appends(spark, t)
    write_checkpoint_v2(t)
    head = sorted(r["id"] for r in delta_scan(spark, t).collect())
    deleted = delta_cleanup_log(t)
    assert len(deleted) == 3  # versions 0..2 (< checkpoint at 3)
    assert _list_versions(t)[0] == 3
    assert sorted(r["id"] for r in delta_scan(spark, t).collect()) == head
    with pytest.raises(ValueError, match="log truncated"):
        delta_scan(spark, t, version_as_of=1).collect()
    with pytest.raises(ValueError, match="log truncated"):
        delta_changes(spark, t, starting_version=0)
    # commit 3 itself is covered by the checkpoint: its pre-state is
    # unknowable from the surviving log, so CDF refuses it too
    with pytest.raises(ValueError, match="log truncated"):
        delta_changes(spark, t, starting_version=3)
    assert [h["version"] for h in delta_history(t)] == [3]
    delta_write(spark.createDataFrame([(99, 9.0)], "id long, v double"), t)
    assert 99 in {r["id"] for r in delta_scan(spark, t).collect()}
    # post-checkpoint commits serve CDF from the checkpoint-seeded walk
    ch = delta_changes(spark, t, starting_version=4)
    assert [(r["id"], r["_change_type"], r["_commit_version"])
            for r in ch.collect()] == [(99, "insert", 4)]
    assert delta_cleanup_log(t, keep_versions=10) == []

def test_changes_after_cleanup_dv_flip_seeded(spark, tmp_path):
    """A post-cleanup DV flip of a PRE-checkpoint file must emit exactly
    the newly-deleted positions -- not full-file inserts (the walk state
    is seeded from the checkpoint snapshot)."""
    t = _fresh(tmp_path, "dlog_dv")
    _four_appends(spark, t)
    write_checkpoint_v2(t)          # checkpoint at version 3
    assert delta_cleanup_log(t)     # versions 0..2 gone
    n = delta_delete(spark, t, "id < 3")   # ids 0..9 live in the v0 file
    assert n == 3                   # version 4: DV flip of a pre-ckpt file
    rows = [(r["id"], r["_change_type"])
            for r in delta_changes(spark, t, starting_version=4).collect()]
    assert sorted(rows) == [(0, "delete"), (1, "delete"), (2, "delete")]

def test_changes_after_cleanup_plain_remove_seeded(spark, tmp_path):
    """A post-cleanup overwrite removing PRE-checkpoint files must emit
    their remaining live rows as deletes (previously: silently nothing)."""
    t = _fresh(tmp_path, "dlog_rm")
    _four_appends(spark, t)
    write_checkpoint_v2(t)
    assert delta_cleanup_log(t)
    delta_write(spark.createDataFrame([(100, 1.0)], "id long, v double"), t,
                mode="overwrite")   # version 4: removes all 4 old files
    ch = delta_changes(spark, t, starting_version=4).collect()
    deletes = sorted(r["id"] for r in ch if r["_change_type"] == "delete")
    inserts = sorted(r["id"] for r in ch if r["_change_type"] == "insert")
    assert deletes == list(range(40))
    assert inserts == [100]

def test_cleanup_then_vacuum_reclaims_via_tombstones(spark, tmp_path):
    """Log cleanup before vacuum must NOT orphan files removed
    pre-checkpoint: the checkpoint carries remove tombstones and vacuum
    reads them."""
    t = _fresh(tmp_path, "dlog_ts")
    delta_write(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"), t)   # v0
    delta_write(spark.createDataFrame(
        [(i, float(i)) for i in range(50, 60)], "id long, v double"), t,
        mode="overwrite")                                              # v1
    _four_appends(spark, t)                                            # v2..v5
    write_checkpoint_v2(t)          # checkpoint at v5 carries v1's tombstone
    assert _checkpoint_tombstones(t), "checkpoint must carry remove tombstones"
    assert delta_cleanup_log(t)     # v0..v4 json (incl the remove action) gone
    reclaimed = delta_vacuum(spark, t, retain_ms=0)
    assert reclaimed, "vacuum must find the pre-checkpoint removed file"
    for rel in reclaimed:
        assert not os.path.exists(os.path.join(t, rel))
    # and HEAD still reads exactly
    got = sorted(r["id"] for r in delta_scan(spark, t).collect())
    assert got == sorted(list(range(40)) + list(range(50, 60)))
    # the NEXT checkpoint drops the satisfied tombstone (file is gone)
    delta_write(spark.createDataFrame([(999, 9.0)], "id long, v double"), t)
    write_checkpoint_v2(t)
    assert _checkpoint_tombstones(t) == {}
