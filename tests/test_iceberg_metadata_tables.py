"""Iceberg ``files`` / ``partitions`` metadata tables (round 10):
per-file manifest records are exact (record_count == parquet footer),
delete files surface with their content class, and the partitions
relation aggregates both sides correctly."""

import os
import shutil

from pyspark.sql import functions as F

from hive_person_service_spark.sources.iceberg import (
    iceberg_delete,
    iceberg_files,
    iceberg_partitions,
    iceberg_snapshots,
    iceberg_write,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _mk(spark, t):
    df1 = spark.createDataFrame(
        [(i, float(i), str(i % 2)) for i in range(20)],
        "id long, v double, ds string",
    )
    iceberg_write(
        df1, t,
        partition_spec=[
            {"name": "ds", "transform": "identity", "source": "ds"}
        ],
    )
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i), str(i % 2)) for i in range(20, 30)],
            "id long, v double, ds string",
        ),
        t,
    )
    iceberg_delete(spark, t, "id % 10 = 0")


def test_files_records_match_footers(spark, tmp_path):
    t = _fresh(tmp_path, "icefiles")
    _mk(spark, t)
    import pyarrow.parquet as papq

    rows = iceberg_files(t)
    data = [r for r in rows if r["content"] == 0]
    dels = [r for r in rows if r["content"] == 1]
    assert data and dels
    for r in rows:
        full = os.path.join(t, r["file_path"])
        assert os.path.exists(full)
        assert r["file_size_in_bytes"] == os.path.getsize(full)
        assert (
            papq.ParquetFile(full).metadata.num_rows == r["record_count"]
        )
    # partition values recorded per data file (identity transform)
    assert {r["partition"].get("ds") for r in data} == {"0", "1"}
    # total data records = both appends, UNREDUCED by the delete
    assert sum(r["record_count"] for r in data) == 30
    assert sum(r["record_count"] for r in dels) == 3  # ids 0,10,20
    # as-of an older snapshot the delete files are absent
    first = iceberg_snapshots(t)[0]["snapshot_id"]
    old = iceberg_files(t, snapshot_id=first)
    assert all(r["content"] == 0 for r in old)
    assert sum(r["record_count"] for r in old) == 20


def test_partitions_aggregates(spark, tmp_path):
    t = _fresh(tmp_path, "iceparts")
    _mk(spark, t)
    parts = iceberg_partitions(t)
    by_ds = {
        p["partition"].get("ds"): p for p in parts if p["partition"]
    }
    assert set(by_ds) == {"0", "1"}
    assert by_ds["0"]["record_count"] == 15  # evens of 0..29
    assert by_ds["1"]["record_count"] == 15
    assert all(p["file_count"] >= 1 for p in by_ds.values())
    assert all(
        p["total_data_file_size_in_bytes"] > 0 for p in by_ds.values()
    )
    # this client's position deletes are partition-global: they
    # aggregate under the empty partition tuple
    glob = [p for p in parts if not p["partition"]]
    assert sum(p["position_delete_record_count"] for p in glob) == 3
    assert sum(p["position_delete_file_count"] for p in glob) >= 1
    assert sum(p["equality_delete_record_count"] for p in parts) == 0


def test_history_rollback_and_refs(spark, tmp_path):
    """snapshot-log maintenance + rollback_to_snapshot: the history
    relation marks off-line snapshots as non-ancestors, parent ids
    chain the lineage, and refs survive head moves."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_history,
        iceberg_refs,
        iceberg_rollback,
        iceberg_scan,
        iceberg_set_ref,
    )

    t = _fresh(tmp_path, "icehist")
    s1 = iceberg_write(
        spark.createDataFrame([(1, 1.0, "a")], "id long, v double, ds string"),
        t,
    )
    s2 = iceberg_write(
        spark.createDataFrame([(2, 2.0, "b")], "id long, v double, ds string"),
        t,
    )
    iceberg_set_ref(t, "rel", ref_type="tag", snapshot_id=s1)
    iceberg_delete(spark, t, "id = 1")
    h = iceberg_history(t)
    assert [e["is_current_ancestor"] for e in h] == [True, True, True]
    assert h[0]["parent_id"] is None and h[1]["parent_id"] == s1
    iceberg_rollback(t, s2)
    h = iceberg_history(t)
    assert len(h) == 4 and h[3]["snapshot_id"] == s2
    assert [e["is_current_ancestor"] for e in h] == [True, True, False, True]
    # head is back at s2: both rows live again
    assert sorted(r["id"] for r in iceberg_scan(spark, t).collect()) == [1, 2]
    refs = {r["name"]: r for r in iceberg_refs(t)}
    assert refs["main"]["snapshot_id"] == s2
    assert refs["rel"]["type"] == "tag" and refs["rel"]["snapshot_id"] == s1
