"""CLEAN table-service pins (sources/hudi.py::hudi_clean): superseded
file slices reclaimed, snapshot identical before/after, replaced groups
reclaimed, MOR logs stacked on reclaimed bases removed, the files index
pruned transactionally, and time travel / incremental pulls before the
retention boundary refused precisely."""

from __future__ import annotations

import os
import shutil

import pytest

from hive_person_service_spark.sources.hudi import (
    _file_slices,
    _load_files_index,
    hudi_build_files_index,
    hudi_clean,
    hudi_compact,
    hudi_incremental,
    hudi_scan,
    hudi_timeline,
    hudi_write,
)


@pytest.fixture()
def people(spark):
    rows = [(i, f"name{i}", float(i) * 1.5) for i in range(1, 101)]
    return spark.createDataFrame(rows, "id long, name string, bal double")


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _data_files(table):
    out = []
    for root, _dirs, files in os.walk(table):
        if ".hoodie" in root:
            continue
        out.extend(f for f in files if not f.startswith("."))
        out.extend(f for f in files if f.startswith(".") and ".log." in f)
    return sorted(out)


def test_clean_reclaims_superseded_cow_slices(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_cow")
    hudi_write(spark, t, people, record_key="id", n_buckets=2)
    hudi_write(  # upsert rewrites BOTH buckets -> strands 2 old bases
        spark, t,
        people.withColumn("bal", people.bal + 10.0),
        record_key="id",
    )
    c3 = hudi_write(
        spark, t,
        people.withColumn("bal", people.bal + 20.0),
        record_key="id",
    )
    before = hudi_scan(spark, t).orderBy("id").collect()
    n_before = len(_data_files(t))
    rcpt = hudi_clean(spark, t, keep_versions=1)
    # 3 versions x 2 buckets on disk; keep 1 version -> 4 reclaimed
    assert rcpt["files_deleted"] == 4
    assert len(_data_files(t)) == n_before - 4
    assert rcpt["earliest_commit_to_retain"] == c3
    # snapshot is untouched by a clean
    after = hudi_scan(spark, t).orderBy("id").collect()
    assert after == before
    # the clean action is on the timeline but not a data commit
    assert all(e["action"] != "clean" for e in hudi_timeline(t))
    assert any(f.endswith(".clean") for f in os.listdir(os.path.join(t, ".hoodie")))


def test_clean_keep2_keeps_middle_slice_travel(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_keep2")
    hudi_write(spark, t, people, record_key="id", n_buckets=2)
    c2 = hudi_write(
        spark, t, people.withColumn("bal", people.bal + 10.0), record_key="id"
    )
    hudi_write(
        spark, t, people.withColumn("bal", people.bal + 20.0), record_key="id"
    )
    rcpt = hudi_clean(spark, t, keep_versions=2)
    assert rcpt["files_deleted"] == 2  # only the v1 bases
    assert rcpt["earliest_commit_to_retain"] == c2
    # travel to the retained middle version still works and is correct
    mid = hudi_scan(spark, t, as_of=c2).orderBy("id").collect()
    assert [r["bal"] for r in mid[:3]] == [11.5, 13.0, 14.5]


def test_travel_and_incremental_refused_before_boundary(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_guard")
    c1 = hudi_write(spark, t, people, record_key="id", n_buckets=2)
    c2 = hudi_write(
        spark, t, people.withColumn("bal", people.bal + 10.0), record_key="id"
    )
    hudi_clean(spark, t, keep_versions=1)
    with pytest.raises(ValueError, match="clean retention boundary"):
        hudi_scan(spark, t, as_of=c1)
    with pytest.raises(ValueError, match="clean retention boundary"):
        hudi_incremental(spark, t, begin=c1)
    # at-or-after the boundary both still work
    assert hudi_scan(spark, t, as_of=c2).count() == 100
    assert hudi_incremental(spark, t, begin=c2).count() == 0


def test_clean_reclaims_replaced_groups(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_replaced")
    hudi_write(spark, t, people, record_key="id", n_buckets=2)
    ro = hudi_write(
        spark, t, people.limit(10), record_key="id", mode="insert_overwrite"
    )
    rcpt = hudi_clean(spark, t, keep_versions=1)
    # the two pre-overwrite bases are invisible -> reclaimed
    assert rcpt["files_deleted"] == 2
    assert rcpt["earliest_commit_to_retain"] == ro
    assert hudi_scan(spark, t).count() == 10


def test_clean_mor_removes_logs_with_their_base(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_mor")
    hudi_write(spark, t, people, record_key="id", table_type="mor", n_buckets=2)
    hudi_write(  # log blocks stacked on the v1 bases
        spark, t,
        people.withColumn("bal", people.bal + 5.0),
        record_key="id", table_type="mor",
    )
    hudi_compact(spark, t)  # new bases absorb the logs
    before = hudi_scan(spark, t).orderBy("id").collect()
    n_logs = sum(1 for f in _data_files(t) if ".log." in f)
    assert n_logs == 2
    rcpt = hudi_clean(spark, t, keep_versions=1)
    # 2 old bases + their 2 log files reclaimed
    assert rcpt["files_deleted"] == 4
    assert sum(1 for f in _data_files(t) if ".log." in f) == 0
    assert hudi_scan(spark, t).orderBy("id").collect() == before


def test_clean_prunes_files_index_transactionally(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_idx")
    hudi_write(spark, t, people, record_key="id", n_buckets=2)
    hudi_write(
        spark, t, people.withColumn("bal", people.bal + 10.0), record_key="id"
    )
    hudi_build_files_index(t)
    idx_before = _load_files_index(t)
    assert idx_before is not None
    hudi_clean(spark, t, keep_versions=1)
    idx = _load_files_index(t)
    names = [n for ns in idx.values() for n in ns]
    assert len(names) == len([n for ns in idx_before.values() for n in ns]) - 2
    # planning from the pruned index resolves the same slices as a walk
    from_idx = _file_slices(t)
    os.remove(os.path.join(t, ".hoodie", "metadata", "files_index.json"))
    from_walk = _file_slices(t)
    assert {f: s["base"] for f, s in from_idx.items()} == {
        f: s["base"] for f, s in from_walk.items()
    }
    # upserts keep working after a clean
    hudi_write(
        spark, t, people.withColumn("bal", people.bal + 30.0), record_key="id"
    )
    assert hudi_scan(spark, t).where("id = 1").collect()[0]["bal"] == 31.5


def test_clean_noop_when_nothing_superseded(spark, people, tmp_path):
    t = _fresh(tmp_path, "clean_noop")
    hudi_write(spark, t, people, record_key="id", n_buckets=2)
    rcpt = hudi_clean(spark, t, keep_versions=1)
    assert rcpt["files_deleted"] == 0
    assert rcpt["earliest_commit_to_retain"] is None
    # no boundary -> time travel unrestricted
    assert hudi_scan(spark, t).count() == 100
