"""Hive ACID transactional table layout (round 9): base/delta/
delete_delta resolution, ROW__ID merge, update = delete+reinsert,
minor/major compaction equivalence."""

import os
import shutil

from pyspark.sql import functions as F

from hive_person_service_spark.sources.hive_acid import (
    hive_acid_compact,
    hive_acid_delete,
    hive_acid_insert,
    hive_acid_scan,
    hive_acid_update,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _mk(spark, t):
    df1 = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 20, 2)], "id long, v double"
    )
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 20, 2)], "id long, v double"
    )
    assert hive_acid_insert(spark, t, df1, key_col="id") == 1
    assert hive_acid_insert(spark, t, df2, key_col="id") == 2


def _ids(spark, t):
    return sorted(r["id"] for r in hive_acid_scan(spark, t).collect())


def test_insert_delete_scan(spark, tmp_path):
    t = _fresh(tmp_path, "acid1")
    _mk(spark, t)
    assert _ids(spark, t) == list(range(20))
    assert os.path.isdir(os.path.join(t, "delta_1_1"))
    assert os.path.isdir(os.path.join(t, "delta_2_2"))
    assert open(os.path.join(t, "_orc_acid_version")).read() == "2"
    n = hive_acid_delete(spark, t, "row.id % 5 = 0")
    assert n == 4
    assert os.path.isdir(os.path.join(t, "delete_delta_3_3"))
    assert _ids(spark, t) == [i for i in range(20) if i % 5]


def test_update_is_delete_plus_reinsert(spark, tmp_path):
    t = _fresh(tmp_path, "acid2")
    _mk(spark, t)
    n = hive_acid_update(spark, t, "row.id % 4 = 0", {"v": "v + 100.0"},
                         key_col="id")
    assert n == 5
    # ONE write id produced both directories
    assert os.path.isdir(os.path.join(t, "delete_delta_3_3"))
    assert os.path.isdir(os.path.join(t, "delta_3_3"))
    got = {r["id"]: r["v"] for r in hive_acid_scan(spark, t).collect()}
    assert len(got) == 20  # row count unchanged
    for i in range(20):
        assert got[i] == (i + 100.0 if i % 4 == 0 else float(i))


def test_minor_compaction_preserves_snapshot(spark, tmp_path):
    t = _fresh(tmp_path, "acid3")
    _mk(spark, t)
    hive_acid_delete(spark, t, "row.id >= 15")
    hive_acid_delete(spark, t, "row.id = 0")
    before = _ids(spark, t)
    res = hive_acid_compact(spark, t, mode="minor")
    assert res["mode"] == "minor" and res["folded"] == 4
    # merged ranges replace the per-write dirs
    assert os.path.isdir(os.path.join(t, "delta_1_2"))
    assert os.path.isdir(os.path.join(t, "delete_delta_3_4"))
    assert not os.path.isdir(os.path.join(t, "delta_1_1"))
    assert _ids(spark, t) == before == [i for i in range(1, 15)]


def test_major_compaction_folds_to_base(spark, tmp_path):
    t = _fresh(tmp_path, "acid4")
    _mk(spark, t)
    hive_acid_update(spark, t, "row.id = 7", {"v": "777.0"}, key_col="id")
    hive_acid_delete(spark, t, "row.id % 10 = 0")
    before = {r["id"]: r["v"] for r in hive_acid_scan(spark, t).collect()}
    res = hive_acid_compact(spark, t, mode="major")
    assert res["mode"] == "major" and res["write_id"] == 4
    assert os.path.isdir(os.path.join(t, "base_4"))
    assert not any(
        d.startswith(("delta_", "delete_delta_")) for d in os.listdir(t)
    )
    after = {r["id"]: r["v"] for r in hive_acid_scan(spark, t).collect()}
    assert after == before
    assert after[7] == 777.0 and 0 not in after and 10 not in after
    # post-compaction writes keep working on top of the base
    hive_acid_insert(
        spark, t,
        spark.createDataFrame([(99, 9.0)], "id long, v double"),
        key_col="id",
    )
    assert 99 in _ids(spark, t)
    n = hive_acid_delete(spark, t, "row.id = 99")
    assert n == 1 and 99 not in _ids(spark, t)


def test_delete_against_compacted_rowids(spark, tmp_path):
    """Major compaction preserves original ROW__IDs, so deletes written
    AFTER compaction must hit rows by their pre-compaction identity."""
    t = _fresh(tmp_path, "acid5")
    _mk(spark, t)
    hive_acid_compact(spark, t, mode="major")
    scan = hive_acid_scan(spark, t, with_row_id=True)
    # originalTransaction values survive the fold (not rewritten to the
    # compaction's write id)
    ots = {r["originalTransaction"] for r in scan.collect()}
    assert ots == {1, 2}
    n = hive_acid_delete(spark, t, "row.id < 3")
    assert n == 3
    assert _ids(spark, t) == list(range(3, 20))


def test_scan_parallelism_one_task_per_file(spark, tmp_path):
    """The executor-side ORC decode plans one input partition per bucket
    file -- driver ships paths only, so a wide table scans in parallel."""
    t = _fresh(tmp_path, "acid6")
    _mk(spark, t)
    df = hive_acid_scan(spark, t).where(F.col("id") > 10)
    n_files = sum(
        len(os.listdir(os.path.join(t, d)))
        for d in os.listdir(t)
        if d.startswith("delta_")
    )
    assert n_files == 4  # 2 writes x 2 buckets
    assert df.rdd.getNumPartitions() == n_files
    assert sorted(r["id"] for r in df.collect()) == list(range(11, 20))


# ---------------------------------------------------------------------------
# Round 11: aborted-write-id visibility (Hive's valid-write-id semantics)
# ---------------------------------------------------------------------------


def test_abort_hides_published_delta(spark, tmp_path):
    import os

    from hive_person_service_spark.sources.hive_acid import (
        _aborted_marker_path,
        hive_acid_abort,
        hive_acid_compact,
        hive_acid_insert,
        hive_acid_scan,
    )

    t = str(tmp_path / "acid_abort")

    def _mk(lo):
        return spark.createDataFrame(
            [(i, float(i)) for i in range(lo, lo + 10)], "id long, v double"
        )

    def ids():
        return sorted(
            r["id"] for r in hive_acid_scan(spark, t).select("id").collect()
        )

    hive_acid_insert(spark, t, _mk(0), key_col="id")    # wid 1
    w2 = hive_acid_insert(spark, t, _mk(10), key_col="id")  # wid 2
    assert ids() == list(range(20))
    # ABORT the published wid 2: scan unchanged from pre-wid-2 state
    hive_acid_abort(t, w2)
    assert ids() == list(range(10))
    assert os.path.isdir(os.path.join(t, f"delta_{w2}_{w2}"))  # still on disk
    # new commits keep landing and stay visible
    hive_acid_insert(spark, t, _mk(20), key_col="id")   # wid 3
    assert ids() == list(range(10)) + list(range(20, 30))
    # minor compaction refuses to fold the aborted delta...
    res = hive_acid_compact(spark, t, mode="minor")
    assert not res.get("noop")
    assert os.path.isdir(os.path.join(t, f"delta_{w2}_{w2}"))
    assert ids() == list(range(10)) + list(range(20, 30))
    # ...and major compaction reclaims it and GCs the marker
    res = hive_acid_compact(spark, t, mode="major")
    assert res["aborted_gc"] == [w2]
    assert not os.path.isdir(os.path.join(t, f"delta_{w2}_{w2}"))
    assert not os.path.exists(_aborted_marker_path(t))
    assert ids() == list(range(10)) + list(range(20, 30))


def test_abort_refuses_committed_history(spark, tmp_path):
    import pytest as _pytest

    from hive_person_service_spark.sources.hive_acid import (
        hive_acid_abort,
        hive_acid_compact,
        hive_acid_insert,
    )

    t = str(tmp_path / "acid_abort_ref")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    hive_acid_insert(spark, t, df, key_col="id")   # wid 1
    hive_acid_insert(spark, t, df, key_col="id")   # wid 2
    hive_acid_compact(spark, t, mode="minor")      # delta_1_2
    with _pytest.raises(ValueError, match="merged into"):
        hive_acid_abort(t, 1)
    hive_acid_compact(spark, t, mode="major")      # base_2
    with _pytest.raises(ValueError, match="folded into"):
        hive_acid_abort(t, 2)


def test_abort_invisible_to_tail_stream(spark, tmp_path):
    import os

    from hive_person_service_spark.sources.hive_acid import (
        hive_acid_abort,
        hive_acid_insert_only,
    )
    from hive_person_service_spark.sources.hive_acid_stream import (
        register_hive_acid_tail,
    )

    t = str(tmp_path / "acid_abort_tail")

    def _mk(lo):
        return spark.createDataFrame(
            [(i, float(i)) for i in range(lo, lo + 10)], "id long, v double"
        )

    hive_acid_insert_only(spark, t, _mk(0), key_col="id")       # wid 1
    w2 = hive_acid_insert_only(spark, t, _mk(10), key_col="id")  # wid 2
    hive_acid_abort(t, w2)
    hive_acid_insert_only(spark, t, _mk(20), key_col="id")      # wid 3
    register_hive_acid_tail(spark)
    scratch = str(tmp_path / "scratch_abort")
    q = (
        spark.readStream.format("hive_acid_tail").option("table", t)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = spark.read.parquet(os.path.join(scratch, "out"))
    # aborted wid 2's rows never stream; the offset still advanced past
    # it (wid 3 delivered)
    assert sorted(r["id"] for r in out.collect()) == (
        list(range(10)) + list(range(20, 30))
    )
