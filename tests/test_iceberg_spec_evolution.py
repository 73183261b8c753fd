"""Partition-spec EVOLUTION pins (sources/iceberg.py round 8): a
long-lived table whose spec changed mid-history mixes manifests written
under different spec-ids; reads must resolve every manifest's partition
tuples with the spec it was written under, and pruning must project a
source-column predicate through EACH file's own transform."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hive_person_service_spark.sources.iceberg import (
    _load_metadata,
    _plan_snapshot,
    _prune_plan,
    iceberg_scan,
    iceberg_update_spec,
    iceberg_write,
)


def _micros(d: datetime.datetime) -> int:
    return int(d.timestamp() * 1_000_000)


def _mk(spark, ids, base_day):
    rows = [
        (
            i,
            datetime.datetime(2024, 1 + (i % 3), 1 + (i % 27), 12, 0, 0),
            i % 5,
            float(i),
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "id long, ts timestamp, uid long, v double"
    )


def _fixture(spark, tmp_path) -> str:
    t = str(tmp_path / "spec_evo")
    # commit 1 under spec 0 = day(ts)
    iceberg_write(
        _mk(spark, range(0, 30), 1),
        t,
        partition_spec=[{"name": "ts_day", "transform": "day", "source": "ts"}],
    )
    # EVOLVE: day -> month + add a bucket field
    new_id = iceberg_update_spec(
        t,
        [
            {"name": "ts_month", "transform": "month", "source": "ts"},
            {"name": "uid_bucket", "transform": "bucket[4]", "source": "uid"},
        ],
    )
    assert new_id == 1
    # commit 2 under spec 1
    iceberg_write(_mk(spark, range(30, 60), 1), t)
    return t


def test_mixed_spec_snapshot_reads_all_rows(spark, tmp_path):
    t = _fixture(spark, tmp_path)
    got = sorted(r.id for r in iceberg_scan(spark, t).collect())
    assert got == list(range(60))


def test_manifests_carry_their_own_spec_id(spark, tmp_path):
    t = _fixture(spark, tmp_path)
    meta = _load_metadata(t)
    plan = _plan_snapshot(t, meta, None)
    spec_ids = {info["spec_id"] for _p, _s, info in plan["data"]}
    assert spec_ids == {0, 1}
    # partition tuple NAMES differ per spec, proving per-manifest decode
    names0 = {
        n
        for _p, _s, info in plan["data"]
        if info["spec_id"] == 0
        for n in (info["partition"] or {})
    }
    names1 = {
        n
        for _p, _s, info in plan["data"]
        if info["spec_id"] == 1
        for n in (info["partition"] or {})
    }
    assert names0 == {"ts_day"}
    assert names1 == {"ts_month", "uid_bucket"}


def test_source_column_filter_prunes_per_spec(spark, tmp_path):
    """A predicate on the SOURCE column (ts) must prune spec-0 files
    through day() and spec-1 files through month() -- each with its own
    transform -- and never prune a file that holds matching rows."""
    t = _fixture(spark, tmp_path)
    meta = _load_metadata(t)
    full = _plan_snapshot(t, meta, None)
    # keep only January: rows with i % 3 == 0 on both sides
    cutoff = _micros(datetime.datetime(2024, 2, 1)) - 1
    flt = [("ts", "<=", cutoff)]
    pruned = _prune_plan(_plan_snapshot(t, meta, None, flt), meta, flt)
    assert 0 < len(pruned["data"]) < len(full["data"])
    # files survived from BOTH specs (January exists on both sides)
    kept_specs = {info["spec_id"] for _p, _s, info in pruned["data"]}
    assert kept_specs == {0, 1}
    # correctness: the pruned scan still returns every January row
    df = iceberg_scan(spark, t, skip_filters=flt)
    got = sorted(
        r.id for r in df.where(F.month("ts") == 1).collect()
    )
    assert got == [i for i in range(60) if i % 3 == 0]


def test_bucket_filter_applies_only_to_new_spec(spark, tmp_path):
    """An equality filter on uid prunes spec-1 files via bucket[4] but
    keeps every spec-0 file (whose spec has no uid field) -- missing
    info must stay conservative, not drop rows."""
    t = _fixture(spark, tmp_path)
    df = iceberg_scan(spark, t, skip_filters=[("uid", "=", 2)])
    got = sorted(r.id for r in df.where("uid = 2").collect())
    assert got == [i for i in range(60) if i % 5 == 2]


def test_update_spec_is_metadata_only(spark, tmp_path):
    t = str(tmp_path / "meta_only")
    iceberg_write(
        _mk(spark, range(10), 1),
        t,
        partition_spec=[{"name": "ts_day", "transform": "day", "source": "ts"}],
    )
    before = _load_metadata(t)
    iceberg_update_spec(
        t, [{"name": "ts_month", "transform": "month", "source": "ts"}]
    )
    after = _load_metadata(t)
    assert len(after["snapshots"]) == len(before["snapshots"])  # no commit
    assert after["default-spec-id"] == 1
    assert [s["spec-id"] for s in after["partition-specs"]] == [0, 1]
    # a field identical to a prior spec's keeps its field-id
    iceberg_update_spec(
        t, [{"name": "ts_day", "transform": "day", "source": "ts"}]
    )
    final = _load_metadata(t)
    fid_orig = final["partition-specs"][0]["fields"][0]["field-id"]
    fid_new = final["partition-specs"][2]["fields"][0]["field-id"]
    assert fid_orig == fid_new
