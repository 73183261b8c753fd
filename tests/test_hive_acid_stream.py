"""Hive ACID streaming (round 10): exactly-once MM ingest (atomic
ingest markers, crash-replay dedup, compaction survival) and the
hive_acid_tail source (offsets = write ids, change-commit gating)."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from hive_person_service_spark.sources.hive_acid import (
    hive_acid_compact,
    hive_acid_delete,
    hive_acid_insert,
    hive_acid_insert_only,
    hive_acid_insert_overwrite,
    hive_acid_scan,
    hive_acid_txn_version,
)
from hive_person_service_spark.sources.hive_acid_stream import (
    register_hive_acid_tail,
)
from hive_person_service_spark.streaming.jobs import stream_into_hive_acid


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _landing(spark, root, n_files=3):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "id long, v double"
    )
    for i in range(n_files):
        df.where(F.col("id") % n_files == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, f"part{i}.parquet"))

    def stream():
        return (
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/part*.parquet")
        )

    return stream


def _ids(spark, t):
    return sorted(r["id"] for r in hive_acid_scan(spark, t).collect())


def test_exactly_once_ingest_and_replay(spark, tmp_path):
    root = _fresh(tmp_path, "acid_ing")
    t = os.path.join(root, "table")
    stream = _landing(spark, os.path.join(root, "landing"))
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck"),
                          app_id="orders", key_col="id")
    assert _ids(spark, t) == list(range(30))
    assert hive_acid_txn_version(t, "orders") == 2
    n_deltas = sum(1 for d in os.listdir(t) if d.startswith("delta_"))
    # replay from a LOST checkpoint: markers must no-op every batch
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck2"),
                          app_id="orders", key_col="id")
    assert _ids(spark, t) == list(range(30))
    assert sum(1 for d in os.listdir(t)
               if d.startswith("delta_")) == n_deltas


def test_crash_replay_does_not_double_ingest(spark, tmp_path):
    root = _fresh(tmp_path, "acid_crash")
    t = os.path.join(root, "table")
    stream = _landing(spark, os.path.join(root, "landing"))
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck"),
                          app_id="o", key_col="id", crash_after_batch=1)
    # crashed AFTER batch 1's atomic publish, BEFORE Spark recorded it
    assert hive_acid_txn_version(t, "o") >= 1
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck"),
                          app_id="o", key_col="id")
    assert _ids(spark, t) == list(range(30))


def test_markers_survive_compaction(spark, tmp_path):
    root = _fresh(tmp_path, "acid_mark")
    t = os.path.join(root, "table")
    stream = _landing(spark, os.path.join(root, "landing"))
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck"),
                          app_id="o", key_col="id")
    hive_acid_compact(spark, t, mode="minor")
    assert hive_acid_txn_version(t, "o") == 2  # carried into delta_1_3
    hive_acid_compact(spark, t, mode="major")
    assert hive_acid_txn_version(t, "o") == 2  # carried into base_3
    # replay after BOTH compactions still no-ops
    stream_into_hive_acid(stream(), t, os.path.join(root, "ck3"),
                          app_id="o", key_col="id")
    assert _ids(spark, t) == list(range(30))


def _drain_tail(spark, t, scratch, **opts):
    reader = spark.readStream.format("hive_acid_tail").option("table", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "acid tail drain timed out"
    return spark.read.parquet(os.path.join(scratch, "out"))


def test_tail_mm_table(spark, tmp_path):
    t = _fresh(tmp_path, "acid_tail_mm")
    for lo in (0, 10, 20):
        hive_acid_insert_only(
            spark, t,
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ),
            key_col="id",
        )
    register_hive_acid_tail(spark)
    scratch = _fresh(tmp_path, "scratch_mm")
    out = _drain_tail(spark, t, scratch)
    assert sorted(r["id"] for r in out.collect()) == list(range(30))
    # incremental catch-up: only the new write id streams
    hive_acid_insert_only(
        spark, t,
        spark.createDataFrame([(99, 9.0)], "id long, v double"),
        key_col="id",
    )
    out = _drain_tail(spark, t, scratch)
    assert sorted(r["id"] for r in out.collect()) == list(range(30)) + [99]


def test_tail_full_acid_and_gating(spark, tmp_path):
    t = _fresh(tmp_path, "acid_tail_full")
    hive_acid_insert(
        spark, t,
        spark.createDataFrame(
            [(i, float(i), str(i % 2)) for i in range(12)],
            "id long, v double, ds string",
        ),
        key_col="id", partition_col="ds",
    )
    register_hive_acid_tail(spark)
    scratch = _fresh(tmp_path, "scratch_full")
    out = _drain_tail(spark, t, scratch)
    # full-ACID rows project row.*; partition col re-attached
    assert sorted((r["id"], r["ds"]) for r in out.collect()) == [
        (i, str(i % 2)) for i in range(12)
    ]
    # a delete_delta is a change commit: the stream gates precisely...
    hive_acid_delete(spark, t, "row.id = 0")
    with pytest.raises(Exception, match="deletes existing data"):
        _drain_tail(spark, t, scratch)
    # ...and skipChangeCommits skips it whole
    scratch2 = _fresh(tmp_path, "scratch_full2")
    out = _drain_tail(spark, t, scratch2, skipChangeCommits="true")
    assert sorted(r["id"] for r in out.collect()) == list(range(12))


def test_insert_overwrite_writes_base(spark, tmp_path):
    t = _fresh(tmp_path, "acid_iow")
    hive_acid_insert(
        spark, t,
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        key_col="id",
    )
    wid = hive_acid_insert_overwrite(
        spark, t,
        spark.createDataFrame([(7, 7.0)], "id long, v double"),
        key_col="id",
    )
    assert os.path.isdir(os.path.join(t, f"base_{wid}"))
    assert _ids(spark, t) == [7]
    # MM variant keeps base files raw
    t2 = _fresh(tmp_path, "acid_iow_mm")
    hive_acid_insert_only(
        spark, t2,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        key_col="id",
    )
    hive_acid_insert_overwrite(
        spark, t2,
        spark.createDataFrame([(8, 8.0)], "id long, v double"),
        key_col="id",
    )
    assert _ids(spark, t2) == [8]
    import pyarrow.orc as pao

    b = os.path.join(t2, "base_2")
    f = os.path.join(b, sorted(os.listdir(b))[0])
    assert pao.ORCFile(f).schema.names == ["id", "v"]


def test_minor_compacted_delta_does_not_replay(spark, tmp_path):
    """ADVICE r10: a minor-compacted delta_lo_hi whose lo falls at or
    below the committed offset must not double-deliver -- full-ACID rows
    filter to originalTransaction in (start, end]."""
    from hive_person_service_spark.sources.hive_acid import hive_acid_compact

    t = _fresh(tmp_path, "acid_tail_minor")
    for lo in (0, 10):  # wid 1, wid 2
        hive_acid_insert(
            spark, t,
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ),
            key_col="id",
        )
    register_hive_acid_tail(spark)
    scratch = _fresh(tmp_path, "scratch_minor")
    out = _drain_tail(spark, t, scratch)
    assert sorted(r["id"] for r in out.collect()) == list(range(20))
    # wid 3 lands, then minor compaction merges wids 1-3 into delta_1_3
    hive_acid_insert(
        spark, t,
        spark.createDataFrame(
            [(i, float(i)) for i in range(20, 30)], "id long, v double"
        ),
        key_col="id",
    )
    res = hive_acid_compact(spark, t, mode="minor")
    assert not res.get("noop")
    assert any(d.startswith("delta_1_") for d in os.listdir(t))
    # resuming the SAME checkpoint streams only wid 3's rows
    out = _drain_tail(spark, t, scratch)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == list(range(30)), f"double-delivery: {len(ids)} rows"
    # a fresh subscriber still gets the whole merged history once
    out2 = _drain_tail(spark, t, _fresh(tmp_path, "scratch_minor2"))
    assert sorted(r["id"] for r in out2.collect()) == list(range(30))


def test_minor_compacted_mm_delta_gates(spark, tmp_path):
    """Insert-only rows carry no per-row write id: a straddling merged
    delta gates like a mid-stream base instead of double-delivering."""
    import pytest as _pytest

    from hive_person_service_spark.sources.hive_acid import hive_acid_compact

    t = _fresh(tmp_path, "acid_tail_minor_mm")
    for lo in (0, 10, 20):
        hive_acid_insert_only(
            spark, t,
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ),
            key_col="id",
        )
    register_hive_acid_tail(spark)
    scratch = _fresh(tmp_path, "scratch_minor_mm")
    out = _drain_tail(spark, t, scratch)
    assert sorted(r["id"] for r in out.collect()) == list(range(30))
    hive_acid_insert_only(
        spark, t,
        spark.createDataFrame([(99, 9.0)], "id long, v double"),
        key_col="id",
    )
    hive_acid_compact(spark, t, mode="minor")  # delta_1_4
    with _pytest.raises(Exception, match="minor-compacted"):
        _drain_tail(spark, t, scratch)
    out = _drain_tail(spark, t, scratch, skipChangeCommits="true")
    assert sorted(r["id"] for r in out.collect()) == list(range(30))


def test_skip_change_commits_skips_update_whole(spark, tmp_path):
    """ADVICE r10: with skipChangeCommits=true an UPDATE skips WHOLE --
    the same-write-id delta of post-image re-inserts must not stream as
    duplicate rows with new values."""
    from hive_person_service_spark.sources.hive_acid import hive_acid_update

    t = _fresh(tmp_path, "acid_tail_upd")
    hive_acid_insert(
        spark, t,
        spark.createDataFrame(
            [(i, float(i)) for i in range(12)], "id long, v double"
        ),
        key_col="id",
    )
    n = hive_acid_update(spark, t, "row.id < 3", {"v": "v + 100.0"})
    assert n == 3
    assert os.path.isdir(os.path.join(t, "delta_2_2"))
    assert os.path.isdir(os.path.join(t, "delete_delta_2_2"))
    register_hive_acid_tail(spark)
    out = _drain_tail(
        spark, t, _fresh(tmp_path, "scratch_upd"), skipChangeCommits="true"
    )
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    assert rows == [(i, float(i)) for i in range(12)], (
        f"UPDATE half-skipped, post-images leaked: {rows}"
    )
