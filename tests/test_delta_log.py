"""Behavioral pins for the minimal Delta Lake protocol client
(sources/delta_log.py): multi-commit snapshots, overwrite removes,
time travel, parquet checkpoints + post-checkpoint replay, hive-style
partitioned layout, history, and the reader-version gate."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def test_delta_append_overwrite_time_travel(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_history,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "t")
    assert delta_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t) == 0
    assert delta_write(_mk(spark, [(3, "a", 3.0)]), t) == 1
    assert {r.id for r in delta_scan(spark, t).collect()} == {1, 2, 3}
    # version 0 sees only the first commit
    assert {r.id for r in delta_scan(spark, t, version_as_of=0).collect()} == {1, 2}
    # overwrite removes every live file and installs the new set
    assert delta_write(_mk(spark, [(9, "c", 9.0)]), t, mode="overwrite") == 2
    assert {r.id for r in delta_scan(spark, t).collect()} == {9}
    # old versions still reconstruct (files are never physically deleted)
    assert {r.id for r in delta_scan(spark, t, version_as_of=1).collect()} == {1, 2, 3}
    hist = delta_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["operation"] == "OVERWRITE"
    assert hist[2]["removed"] > 0


def test_delta_checkpoint_and_replay(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "ckpt")
    # interval 2 -> checkpoint at version 2; commits 3..4 replay on top
    for i in range(5):
        delta_write(
            _mk(spark, [(i, "g", float(i))]), t, checkpoint_interval=2
        )
    import os

    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))
    assert any(n.endswith(".checkpoint.parquet") for n in os.listdir(log))
    got = {r.id for r in delta_scan(spark, t).collect()}
    assert got == {0, 1, 2, 3, 4}
    # time travel BEFORE the checkpoint forces a from-scratch replay
    assert {r.id for r in delta_scan(spark, t, version_as_of=1).collect()} == {0, 1}


def test_delta_partitioned_layout(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "part")
    df = _mk(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)])
    delta_write(df, t, partition_by=["grp"])
    back = delta_scan(spark, t)
    assert "grp" in back.columns  # re-derived from hive-style dirs
    assert {(r.id, r.grp) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "a")}
    # partition pruning reaches the scan
    plan = back.where(F.col("grp") == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_delta_reader_version_gate(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "gate")
    delta_write(_mk(spark, [(1, "a", 1.0)]), t)
    # upgrade the protocol to v3 (deletion vectors) by hand
    import os

    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"]}}) + "\n")
    # deletionVectors is a SUPPORTED reader feature now (delta_dv.py):
    # the v3 table scans fine
    assert {r.id for r in delta_scan(spark, t).collect()} == {1}
    # a v2 (column-mapping era) protocol passes the gate too -- the mode
    # config drives the rename (tested in the column-mapping test); an
    # UNKNOWN v3 feature still gates precisely
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "v2Checkpoint"]}}) + "\n")
    with pytest.raises(ValueError, match="v2Checkpoint"):
        delta_scan(spark, t)
    # not-a-delta-table error is precise too
    with pytest.raises(ValueError, match="_delta_log"):
        delta_scan(spark, str(tmp_path / "nope"))


def test_delta_commit_put_if_absent(spark, tmp_path):
    """Two writers racing the same version must NOT both succeed: the
    commit primitive is os.link put-if-absent (rename silently replaces)."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "race")
    delta_write(_mk(spark, [(1, "a", 1.0)]), t)
    # simulate a concurrent writer that claims version 1 BETWEEN the
    # loser's version computation and its commit -- exactly the window the
    # put-if-absent primitive must close (delta_write recomputes the
    # version up front, so the race is against _commit itself)
    from hive_person_service_spark.sources.delta_log import _commit

    log = os.path.join(t, "_delta_log")
    claimed = os.path.join(log, f"{1:020d}.json")
    with open(claimed, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n")
    with pytest.raises(ValueError, match="concurrent commit"):
        _commit(t, 1, [{"commitInfo": {"operation": "LOSER"}}])
    # the loser's commit was NOT installed over the winner's
    with open(claimed) as fh:
        assert "LOSER" not in fh.read()
    # no temp droppings left behind
    assert not [n for n in os.listdir(log) if n.startswith(".tmp-")]
    assert {r.id for r in delta_scan(spark, t).collect()} == {1}


def test_delta_truncated_log_time_travel_errors(spark, tmp_path):
    """Time travel below the newest checkpoint must error (not silently
    rebuild a partial snapshot) when retention deleted the early log."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "trunc")
    for i in range(5):
        delta_write(_mk(spark, [(i, "g", float(i))]), t, checkpoint_interval=2)
    log = os.path.join(t, "_delta_log")
    # standard retention: drop commits the newest checkpoint (v4) covers
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    # HEAD still reconstructs from the checkpoint
    assert {r.id for r in delta_scan(spark, t).collect()} == {0, 1, 2, 3, 4}
    with pytest.raises(ValueError, match="log truncated"):
        delta_scan(spark, t, version_as_of=1)
    # a version beyond HEAD errors precisely too
    with pytest.raises(ValueError, match="does not exist"):
        delta_scan(spark, t, version_as_of=99)


def test_delta_deletion_vectors_roundtrip(spark, tmp_path):
    """DELETE via deletion vectors: no data-file rewrite, protocol upgrade
    to readerVersion 3 + deletionVectors, scan applies the bitmaps, a
    second delete MERGES per-file deletion state, and time travel before
    the delete still sees every row."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "dv")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(100)],
        "id long, grp string, v double",
    )
    delta_write(df, t)
    data_files_before = {
        n for n in os.listdir(t) if not n.startswith("_")
    }
    assert delta_delete(spark, t, "id % 10 = 0") == 10
    # data files untouched; one DV file appeared
    survivors = delta_scan(spark, t)
    assert survivors.count() == 90
    assert {r.id for r in survivors.where("id < 25").collect()} == (
        set(range(25)) - {0, 10, 20}
    )
    dv_files = [n for n in os.listdir(t) if n.startswith("deletion_vector_")]
    assert len(dv_files) == 1
    assert data_files_before <= set(os.listdir(t))
    # second delete merges with the existing DV state
    assert delta_delete(spark, t, "id % 10 = 5") == 10
    assert delta_scan(spark, t).count() == 80
    # idempotence: re-deleting already-deleted rows is a no-op commit
    assert delta_delete(spark, t, "id % 10 = 0") == 0
    # time travel to version 0 (pre-delete) sees all rows
    assert delta_scan(spark, t, version_as_of=0).count() == 100
    # aggregates over the DV scan are exact
    got = survivors.agg({"v": "sum"}).collect()[0][0]
    assert got == float(sum(i for i in range(100) if i % 10 != 0))


def test_delta_dv_checkpoint_skipped_not_lossy(spark, tmp_path):
    """A checkpoint interval that lands after a DV commit must NOT emit a
    checkpoint that resurrects deleted rows."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "dvckpt")
    for i in range(2):
        delta_write(
            spark.createDataFrame(
                [(i * 10 + j, "g", 1.0) for j in range(10)],
                "id long, grp string, v double",
            ),
            t,
            checkpoint_interval=2,
        )
    delta_delete(spark, t, "id < 5")
    # force another commit on the checkpoint boundary (version 4)
    delta_write(
        spark.createDataFrame([(999, "g", 9.9)], "id long, grp string, v double"),
        t,
        checkpoint_interval=2,
    )
    assert delta_scan(spark, t).count() == 16  # 20 - 5 + 1
    log = os.path.join(t, "_delta_log")
    ckpts = [n for n in os.listdir(log) if n.endswith(".checkpoint.parquet")]
    # the version-2 checkpoint (pre-DV) may exist; none after the DV commit
    assert all(int(n.split(".")[0]) < 3 for n in ckpts)


def test_delta_dv_plus_cm_features_pass_gate(spark, tmp_path):
    """Both supported reader features together pass the protocol gate;
    with no columnMapping mode configured the table scans as-is."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "cm")
    delta_write(
        spark.createDataFrame([(1, "a", 1.0)], "id long, grp string, v double"), t
    )
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"]}}) + "\n")
    assert {r.id for r in delta_scan(spark, t).collect()} == {1}


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """NAME-mode column mapping: data files carry physical col-<uuid>
    names; the scan renames them to the logical schema from
    metaData.schemaString field metadata. id mode still gates."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        _commit,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "cmname")
    physical = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, grp string, v double"
    ).select(
        F.col("id").alias("col-aaa111"),
        F.col("grp").alias("col-bbb222"),
        F.col("v").alias("col-ccc333"),
    )
    delta_write(physical, t)
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa111"}},
        {"name": "grp", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb222"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-ccc333"}},
    ]
    _commit(t, 1, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cm-test", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0,
        }},
    ])
    got = delta_scan(spark, t)
    assert got.columns == ["id", "grp", "v"]
    assert {(r.id, r.grp, r.v) for r in got.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }
    # switching the same table to id mode: files carry no field ids, so
    # resolution falls back to physicalName — still readable, same rows
    _commit(t, 2, [
        {"metaData": {
            "id": "cm-test", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }},
    ])
    got2 = delta_scan(spark, t)
    assert {(r.id, r.grp, r.v) for r in got2.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }


def _id_mode_table(tmp_path, name, files):
    """Build an id-mode Delta table whose parquet FOOTER names disagree
    with the metadata physicalName; ``files`` is a list of
    (footer_names, rows) per data file."""
    import os as _os
    import time as _time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as papq

    from hive_person_service_spark.sources.delta_log import _commit

    t = str(tmp_path / name)
    _os.makedirs(_os.path.join(t, "_delta_log"), exist_ok=True)
    types = [pa.int64(), pa.string(), pa.float64()]
    adds = []
    for footer_names, rows in files:
        schema = pa.schema(
            [
                pa.field(n, ty, metadata={b"PARQUET:field_id": str(i + 1).encode()})
                for i, (n, ty) in enumerate(zip(footer_names, types))
            ]
        )
        tbl = pa.table(
            [pa.array([r[i] for r in rows], ty) for i, ty in enumerate(types)],
            schema=schema,
        )
        rel = f"part-{_uuid.uuid4().hex[:10]}.parquet"
        papq.write_table(tbl, _os.path.join(t, rel))
        adds.append({"add": {
            "path": rel, "partitionValues": {},
            "size": _os.path.getsize(_os.path.join(t, rel)),
            "modificationTime": int(_time.time() * 1000), "dataChange": True,
        }})
    fields = [
        {"name": n, "type": ty, "nullable": True,
         "metadata": {"delta.columnMapping.id": i + 1,
                      "delta.columnMapping.physicalName": f"col-{i}"}}
        for i, (n, ty) in enumerate(
            [("id", "long"), ("grp", "string"), ("v", "double")]
        )
    ]
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmid-test", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }},
        *adds,
    ])
    return t


def test_delta_column_mapping_id_mode(spark, tmp_path):
    """ID mode resolves by PARQUET:field_id, authoritative over the
    metadata physicalName (footer names here are fcol_*, physicalName
    says col-*)."""
    from hive_person_service_spark.sources.delta_log import delta_scan

    t = _id_mode_table(
        tmp_path, "cmid",
        [
            (["fcol_a", "fcol_b", "fcol_c"], [(1, "a", 1.5)]),
            (["fcol_a", "fcol_b", "fcol_c"], [(2, "b", 2.5)]),
        ],
    )
    got = delta_scan(spark, t)
    assert got.columns == ["id", "grp", "v"]
    assert {(r.id, r.grp, r.v) for r in got.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }


def test_delta_id_mode_divergent_footers_gate(spark, tmp_path):
    """One field id mapping to different footer names across files gates
    precisely (a single relational scan cannot remap per-file)."""
    from hive_person_service_spark.sources.delta_log import delta_scan

    t = _id_mode_table(
        tmp_path, "cmiddiv",
        [
            (["fcol_a", "fcol_b", "fcol_c"], [(1, "a", 1.5)]),
            (["other_a", "fcol_b", "fcol_c"], [(2, "b", 2.5)]),
        ],
    )
    with pytest.raises(ValueError, match="different physical names"):
        delta_scan(spark, t)


def test_delta_id_mode_missing_id_gate(spark, tmp_path):
    """id mode with a field missing delta.columnMapping.id gates."""
    from hive_person_service_spark.sources.delta_log import _commit, delta_scan

    t = _id_mode_table(
        tmp_path, "cmidmiss", [(["fcol_a", "fcol_b", "fcol_c"], [(1, "a", 1.5)])]
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "grp", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-1"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-2"}},
    ]
    _commit(t, 1, [
        {"metaData": {
            "id": "cmid-test", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }},
    ])
    with pytest.raises(ValueError, match="no delta.columnMapping.id"):
        delta_scan(spark, t)


def test_delta_update_via_dv(spark, tmp_path):
    """UPDATE = DV-delete the matches + append their updated images; the
    final table equals a plain CASE projection of the original."""
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_update,
        delta_write,
    )

    t = str(tmp_path / "upd")
    delta_write(_mk(spark, [(i, "g", float(i)) for i in range(20)]), t)
    n = delta_update(
        spark, t, "id >= 15", {"v": "v * 10", "grp": "'boosted'"}
    )
    assert n == 5
    got = {(r.id, r.grp, r.v) for r in delta_scan(spark, t).collect()}
    expected = {
        (i, "boosted" if i >= 15 else "g", float(i) * (10 if i >= 15 else 1))
        for i in range(20)
    }
    assert got == expected
    # idempotence guard: predicate no longer matches anything new with
    # the same effect (re-running multiplies again -- standard UPDATE)
    assert delta_scan(spark, t).count() == 20


def test_delta_multipart_checkpoint(spark, tmp_path):
    """Classic multi-part checkpoints (<v>.checkpoint.<i>.<n>.parquet)
    reconstruct by unioning the parts; an incomplete part set errors."""
    import os
    import shutil

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "mp")
    for i in range(3):
        delta_write(_mk(spark, [(i, "g", float(i))]), t, checkpoint_interval=2)
    log = os.path.join(t, "_delta_log")
    single = os.path.join(log, f"{2:020d}.checkpoint.parquet")
    assert os.path.exists(single)
    # split the single-part checkpoint into a 2-part one by duplicating
    # rows across parts via pyarrow
    import pyarrow.parquet as pq

    tbl = pq.read_table(single)
    pq.write_table(
        tbl.slice(0, len(tbl) // 2),
        os.path.join(log, f"{2:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    pq.write_table(
        tbl.slice(len(tbl) // 2),
        os.path.join(log, f"{2:020d}.checkpoint.{2:010d}.{2:010d}.parquet"),
    )
    os.remove(single)
    assert {r.id for r in delta_scan(spark, t).collect()} == {0, 1, 2}
    # drop one part -> precise incompleteness error
    os.remove(os.path.join(log, f"{2:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incomplete"):
        delta_scan(spark, t)


def test_stream_into_delta_exactly_once(spark, tmp_path):
    """Streaming ingest into Delta is exactly-once through BOTH failure
    windows: (a) crash after the delta commit but before Spark's own
    batch checkpoint -> restart redelivers the batch -> txn skip; (b) a
    REBUILT checkpoint re-running every batch from 0 -> all skipped."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_history,
        delta_scan,
    )
    from hive_person_service_spark.streaming.jobs import stream_into_delta

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(10)], "id long, v double"
        ).coalesce(1).write.parquet(os.path.join(landing, f"batch{i}.parquet"))
    src = lambda: (  # noqa: E731
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/batch*.parquet")
    )
    table = str(tmp_path / "delta_sink")
    ckpt = str(tmp_path / "ckpt")

    # (a) crash after batch 1's delta commit, resume from SAME checkpoint
    stream_into_delta(src(), table, ckpt, crash_after_batch=1)
    mid = delta_scan(spark, table).count()
    assert mid >= 20  # batches 0 and 1 are in
    stream_into_delta(src(), table, ckpt)  # resume: redelivery must skip
    assert delta_scan(spark, table).count() == 30
    assert delta_scan(spark, table).select("id").distinct().count() == 30

    # (b) checkpoint LOST: a fresh checkpoint replays batches 0..2 -- the
    # txn versions in the log make every one a no-op
    versions_before = [h["version"] for h in delta_history(table)]
    stream_into_delta(src(), table, str(tmp_path / "ckpt2"))
    assert delta_scan(spark, table).count() == 30
    assert [h["version"] for h in delta_history(table)] == versions_before


def test_delta_optimize_and_vacuum(spark, tmp_path):
    """OPTIMIZE compacts the live file set (dataChange=false commit,
    content invariant, DVs applied into the rewrite); VACUUM physically
    deletes unreferenced files, after which HEAD still scans but time
    travel to a vacuumed version fails at scan time."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_history,
        delta_optimize,
        delta_scan,
        delta_vacuum,
        delta_write,
    )

    t = str(tmp_path / "opt")
    for i in range(4):  # 4 commits -> >= 4 data files
        delta_write(
            spark.createDataFrame(
                [(i * 10 + j, float(j)) for j in range(10)], "id long, v double"
            ),
            t,
        )
    delta_delete(spark, t, "id % 10 = 0")  # DV on every file
    before = {r.id for r in delta_scan(spark, t).collect()}
    assert len(before) == 36
    stats = delta_optimize(spark, t, target_files=1)
    assert stats["files_before"] >= 4
    assert stats["files_after"] == 1
    after = {r.id for r in delta_scan(spark, t).collect()}
    assert after == before  # content-invariant, DV applied into rewrite
    hist = delta_history(t)
    assert hist[-1]["operation"] == "OPTIMIZE"
    # old versions still reconstruct pre-vacuum
    assert delta_scan(spark, t, version_as_of=0).count() == 10
    removed = delta_vacuum(spark, t, retain_ms=0)
    assert removed  # the pre-OPTIMIZE files are physically gone
    assert {r.id for r in delta_scan(spark, t).collect()} == before
    # time travel to a vacuumed version now fails at SCAN time
    import pytest as _pytest

    with _pytest.raises(Exception):
        delta_scan(spark, t, version_as_of=0).collect()


def test_txn_state_survives_checkpoint_retention(spark, tmp_path):
    """The exactly-once marker must outlive log retention: txn versions
    are carried into checkpoints, so deleting every pre-checkpoint JSON
    commit (standard cleanup) must NOT let a rebuilt streaming
    checkpoint re-ingest old batches."""
    import os

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_txn_version,
        delta_write,
    )
    from hive_person_service_spark.streaming.jobs import stream_into_delta

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i in range(2):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(10)], "id long, v double"
        ).coalesce(1).write.parquet(os.path.join(landing, f"b{i}.parquet"))
    src = lambda: (  # noqa: E731
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/b*.parquet")
    )
    table = str(tmp_path / "t")
    stream_into_delta(src(), table, str(tmp_path / "ck1"))
    assert delta_txn_version(table, "delta-ingest") == 1
    # non-stream writes push the log past a checkpoint boundary
    for j in range(3):
        delta_write(
            spark.createDataFrame([(900 + j, 0.0)], "id long, v double"),
            table,
            checkpoint_interval=2,
        )
    log = os.path.join(table, "_delta_log")
    ckpts = [n for n in os.listdir(log) if n.endswith(".checkpoint.parquet")]
    assert ckpts, "test setup: expected a checkpoint"
    ckpt_v = max(int(n.split(".")[0]) for n in ckpts)
    # retention deletes every pre-checkpoint commit -- including the ones
    # that carried the txn actions
    for v in range(ckpt_v):
        p = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    # the marker survives via the checkpoint's txn rows
    assert delta_txn_version(table, "delta-ingest") == 1
    before = delta_scan(spark, table).count()
    stream_into_delta(src(), table, str(tmp_path / "ck2"))  # rebuilt ckpt
    assert delta_scan(spark, table).count() == before  # no re-ingest


# ---------------------------------------------------------------------------
# Round 11: row tracking (read side)
# ---------------------------------------------------------------------------


def test_row_tracking_stable_ids_across_update(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_changes,
        delta_scan,
        delta_update,
        delta_write,
    )

    t = str(tmp_path / "rt")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    delta_write(df.repartition(1).sortWithinPartitions("id"), t,
                configuration={"delta.enableRowTracking": "true"})
    before = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in delta_scan(spark, t, with_row_tracking=True).collect()
    }
    assert sorted(before) == list(range(20))
    assert [before[i][0] for i in range(20)] == list(range(20))  # rank ids
    assert all(v == 0 for _i, v in before.values())
    n = delta_update(spark, t, "id % 5 = 0", {"v": "v + 100.0"})
    assert n == 4
    after = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in delta_scan(spark, t, with_row_tracking=True).collect()
    }
    # stability: every row keeps its id through the DV-delete+re-insert
    assert {i: rid for i, (rid, _v) in after.items()} == {
        i: rid for i, (rid, _v) in before.items()
    }
    # commit version reflects the last write of the row
    assert {v for i, (_r, v) in after.items() if i % 5 == 0} == {2}
    assert {v for i, (_r, v) in after.items() if i % 5 != 0} == {0}
    # certify via the CDF: the update's delete pre-images are exactly
    # the rows whose commit version moved
    moved = sorted(i for i in after if after[i][1] != before[i][1])
    dels = sorted(
        r["id"] for r in delta_changes(spark, t, starting_version=1)
        .where("_change_type = 'delete'").collect()
    )
    assert dels == moved == [0, 5, 10, 15]
    # plain scans never leak the materialized bookkeeping column
    assert delta_scan(spark, t).columns == ["id", "v"]
    assert delta_scan(spark, t).count() == 20


def test_row_tracking_requires_table_property(spark, tmp_path):
    import pytest as _pytest

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "rt_off")
    delta_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), t
    )
    with _pytest.raises(ValueError, match="enableRowTracking"):
        delta_scan(spark, t, with_row_tracking=True)


def test_row_tracking_fresh_ids_monotone_across_appends(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "rt_app")
    for lo in (0, 10, 20):
        delta_write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ).repartition(1).sortWithinPartitions("id"),
            t,
            configuration=(
                {"delta.enableRowTracking": "true"} if lo == 0 else None
            ),
        )
    rows = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in delta_scan(spark, t, with_row_tracking=True).collect()
    }
    ids = [rows[i][0] for i in sorted(rows)]
    assert sorted(ids) == ids and len(set(ids)) == 30  # unique, monotone
    assert {rows[i][1] for i in range(0, 10)} == {0}
    assert {rows[i][1] for i in range(10, 20)} == {1}
    assert {rows[i][1] for i in range(20, 30)} == {2}


def test_row_tracking_survives_optimize(spark, tmp_path):
    """A dataChange=false rewrite (OPTIMIZE) must preserve row ids AND
    commit versions -- the spec's stability contract for reorganizing
    commits."""
    from hive_person_service_spark.sources.delta_log import (
        delta_optimize,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "rt_opt")
    for lo in (0, 10):
        delta_write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ).repartition(1).sortWithinPartitions("id"),
            t,
            configuration=(
                {"delta.enableRowTracking": "true"} if lo == 0 else None
            ),
        )
    before = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in delta_scan(spark, t, with_row_tracking=True).collect()
    }
    res = delta_optimize(spark, t)
    assert res["files_after"] == 1
    after = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in delta_scan(spark, t, with_row_tracking=True).collect()
    }
    assert after == before, "OPTIMIZE changed row ids or commit versions"
    # and the feed over the OPTIMIZE stays empty (dataChange=false)
    from hive_person_service_spark.sources.delta_log import delta_changes

    assert delta_changes(spark, t, starting_version=2).collect() == []
    # plain scan stays clean
    assert delta_scan(spark, t).columns == ["id", "v"]
