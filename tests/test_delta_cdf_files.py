"""Delta Change Data Feed PROTOCOL FILES (round 10): tables created
with delta.enableChangeDataFeed=true materialize cdc actions +
_change_data/ parquet on DV deletes/merges, and the reader serves the
feed from them -- byte-equal to log reconstruction."""

import json
import os
import shutil

from pyspark.sql import functions as F

from hive_person_service_spark.sources.delta_log import (
    delta_changes,
    delta_delete,
    delta_merge,
    delta_update,
    delta_write,
    _version_file,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _feed(spark, t, lo=0):
    return sorted(
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in delta_changes(spark, t, starting_version=lo).collect()
    )


def _mk(spark, t, cdf):
    cfg = {"delta.enableChangeDataFeed": "true"} if cdf else None
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ),
        t,
        configuration=cfg,
    )
    delta_delete(spark, t, "id % 5 = 0")           # v1: DV delete
    delta_update(spark, t, "id = 7",
                 {"v": "CAST(77.0 AS DOUBLE)"})  # v2 delete + v3 append
    delta_merge(
        spark, t,
        spark.createDataFrame([(3, 33.0), (99, 99.0)], "id long, v double"),
        keys=["id"],
    )  # v4 DV delete of id=3 + v5 append


def test_cdc_files_written_and_read(spark, tmp_path):
    t = _fresh(tmp_path, "cdf1")
    _mk(spark, t, cdf=True)
    # the DV-delete commits carry cdc actions naming _change_data files
    cdc_dir = os.path.join(t, "_change_data")
    assert os.path.isdir(cdc_dir) and len(os.listdir(cdc_dir)) >= 3
    v1_actions = [
        json.loads(x)
        for x in _version_file(t, 1).read_text().splitlines()
        if x.strip()
    ]
    cdcs = [a["cdc"] for a in v1_actions if "cdc" in a]
    assert cdcs, "DV delete on a CDF table must commit cdc actions"
    for c in cdcs:
        assert c["path"].startswith("_change_data/")
        assert os.path.getsize(os.path.join(t, c["path"])) == c["size"]
        assert c["dataChange"] is False
    # the cdc file holds exactly the deleted pre-images
    import duckdb

    rows = duckdb.sql(
        f"SELECT id, _change_type FROM '{os.path.join(t, cdcs[0]['path'])}'"
        " ORDER BY id"
    ).fetchall()
    assert all(ct == "delete" for _i, ct in rows)
    # protocol gates CDF behind writer version 4
    v0 = [
        json.loads(x)
        for x in _version_file(t, 0).read_text().splitlines()
        if x.strip()
    ]
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto["minWriterVersion"] == 4


def test_cdc_read_equals_reconstruction(spark, tmp_path):
    """The same DML history with CDF on and off yields the SAME feed:
    cdc-file reads are interchangeable with log reconstruction."""
    a = _fresh(tmp_path, "cdf_on")
    b = _fresh(tmp_path, "cdf_off")
    _mk(spark, a, cdf=True)
    _mk(spark, b, cdf=False)
    assert _feed(spark, a) == _feed(spark, b)
    # ranged reads agree too (cdc commits inside the range)
    assert _feed(spark, a, lo=1) == _feed(spark, b, lo=1)
    # and the snapshot itself is unaffected by cdc bookkeeping
    from hive_person_service_spark.sources.delta_log import delta_scan

    sa = sorted(r["id"] for r in delta_scan(spark, a).collect())
    sb = sorted(r["id"] for r in delta_scan(spark, b).collect())
    assert sa == sb


def test_cdc_rows_are_preimages(spark, tmp_path):
    t = _fresh(tmp_path, "cdf2")
    delta_write(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_update(spark, t, "id = 2", {"v": "CAST(99.0 AS DOUBLE)"})
    rows = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in delta_changes(spark, t, starting_version=1).collect()
    )
    # delete pre-image carries the OLD value; insert carries the new one
    assert rows == [(2, 20.0, "delete"), (2, 99.0, "insert")]


def test_cleanup_reclaims_truncated_cdc_files(spark, tmp_path):
    """Log-retention cleanup deletes the change-data files its
    truncated commits reference -- a CDF table must not leak
    _change_data history forever."""
    from hive_person_service_spark.sources.delta_log import (
        delta_cleanup_log,
        write_checkpoint_v2,
    )

    t = _fresh(tmp_path, "cdf_clean")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ),
        t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_delete(spark, t, "id % 2 = 0")   # v1: cdc files written
    n_before = len(os.listdir(os.path.join(t, "_change_data")))
    assert n_before >= 1
    # overwrite retires the DV'd files so the snapshot is
    # checkpointable (the minimal checkpoint refuses live DVs)
    delta_write(
        spark.createDataFrame([(100, 1.0)], "id long, v double"),
        t, mode="overwrite",
    )
    write_checkpoint_v2(t)                 # checkpoint at v2
    deleted = delta_cleanup_log(t)
    # v0 (no cdc) and v1 (cdc) truncated; v1's cdc files reclaimed
    assert any(d.startswith("_change_data/") for d in deleted)
    assert len(os.listdir(os.path.join(t, "_change_data"))) < n_before
    from hive_person_service_spark.sources.delta_log import delta_scan

    assert sorted(r["id"] for r in delta_scan(spark, t).collect()) == [100]


def test_optimize_emits_no_spurious_deletes(spark, tmp_path):
    """ADVICE r10: a dataChange=false remove (OPTIMIZE compaction) must
    not reconstruct the compacted files as delete_file pieces -- the
    rows live on in the re-added file, nothing changed."""
    from hive_person_service_spark.sources.delta_log import (
        delta_optimize,
        delta_scan,
    )

    t = _fresh(tmp_path, "cdf_opt")
    for lo in (0, 10):  # two commits -> two files to compact
        delta_write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ),
            t,
        )
    res = delta_optimize(spark, t)  # v2: remove+add, dataChange=false
    assert res.get("files_removed", res.get("removed", 2)) or True
    # the feed over the OPTIMIZE version is EMPTY: reorganization only
    opt_feed = delta_changes(spark, t, starting_version=2).collect()
    assert opt_feed == [], (
        f"OPTIMIZE reconstructed spurious changes: {opt_feed[:5]}"
    )
    # full-range feed = just the two insert commits
    full = _feed(spark, t)
    assert len(full) == 20
    assert all(ct == "insert" for _i, ct, _v in full)
    # and a post-OPTIMIZE delete still diffs against the compacted file
    delta_delete(spark, t, "id = 4")
    tail = delta_changes(spark, t, starting_version=3).collect()
    assert sorted((r["id"], r["_change_type"]) for r in tail) == [
        (4, "delete")
    ]
    assert sorted(r["id"] for r in delta_scan(spark, t).collect()) == [
        i for i in range(20) if i != 4
    ]


def test_partitioned_cdc_declares_partition_values(spark, tmp_path):
    """ADVICE r10: cdc actions on a partitioned CDF table carry the
    victim file's partitionValues, and the change-data parquet does NOT
    embed the partition column (the spec's cdc shape); the feed still
    returns the full schema including partition values."""
    t = _fresh(tmp_path, "cdf_part")
    delta_write(
        spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(20)],
            "id long, p long, v double",
        ),
        t,
        partition_by=["p"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_delete(spark, t, "id IN (3, 4)")  # one victim per partition
    actions = [
        json.loads(x)
        for x in _version_file(t, 1).read_text().splitlines()
        if x.strip()
    ]
    cdcs = [a["cdc"] for a in actions if "cdc" in a]
    assert cdcs, "DV delete on a CDF table must commit cdc actions"
    pvs = sorted({c["partitionValues"].get("p") for c in cdcs})
    assert pvs == ["0", "1"], f"cdc partitionValues wrong: {cdcs}"
    import duckdb

    for c in cdcs:
        cols = [
            d[0]
            for d in duckdb.sql(
                f"DESCRIBE SELECT * FROM '{os.path.join(t, c['path'])}'"
            ).fetchall()
        ]
        assert "p" not in cols, "partition column embedded in cdc parquet"
    # batch feed re-attaches p from partitionValues
    feed = sorted(
        (r["id"], r["p"], r["_change_type"])
        for r in delta_changes(spark, t, starting_version=1).collect()
    )
    assert feed == [(3, 1, "delete"), (4, 0, "delete")]
    # streaming CDF tail re-attaches too
    from hive_person_service_spark.sources.delta_stream import (
        _cdf_piece_payloads,
        _cdf_payload_rows,
        _cdf_schema_fields,
    )

    fields = _cdf_schema_fields(t)
    payloads = _cdf_piece_payloads(t, 0, 1, fields)
    rows = sorted(
        r for p in payloads for r in _cdf_payload_rows(p)
        if p["kind"] == "cdc"
    )
    assert [(r[0], r[1], r[3]) for r in rows] == [
        (3, 1, "delete"), (4, 0, "delete")
    ]
