"""Hive ACID round-10 shapes: partitioned tables (pruning, DML,
per-partition compaction), upgraded tables (original_ files with
synthesized ROW__IDs), and insert-only (MM) tables."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hive_person_service_spark.sources.hive_acid import (
    hive_acid_compact,
    hive_acid_convert,
    hive_acid_delete,
    hive_acid_insert,
    hive_acid_insert_only,
    hive_acid_scan,
    hive_acid_seed_originals,
    hive_acid_update,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, float(i), str(i % 3)) for i in range(lo, hi)],
        "id long, v double, ds string",
    )


def _ids(spark, t, **kw):
    return sorted(r["id"] for r in hive_acid_scan(spark, t, **kw).collect())


# ---------------------------------------------------------------------------
# partitioned tables
# ---------------------------------------------------------------------------


def test_partitioned_insert_scan_prune(spark, tmp_path):
    t = _fresh(tmp_path, "pacid1")
    wid = hive_acid_insert(spark, t, _df(spark, 0, 30), key_col="id",
                           partition_col="ds")
    assert wid == 1
    # Hive layout: <part>=<val>/delta_1_1/bucket_*
    assert sorted(d for d in os.listdir(t) if "=" in d) == [
        "ds=0", "ds=1", "ds=2"
    ]
    assert os.path.isdir(os.path.join(t, "ds=1", "delta_1_1"))
    got = hive_acid_scan(spark, t)
    assert "ds" in got.columns  # partition col re-attached from dir name
    assert _ids(spark, t) == list(range(30))
    # driver-side partition pruning: only ds=1 files are listed
    pruned = hive_acid_scan(spark, t,
                            partition_filters=[("ds", "=", "1")])
    assert sorted(r["id"] for r in pruned.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]
    assert pruned.rdd.getNumPartitions() == len(
        os.listdir(os.path.join(t, "ds=1", "delta_1_1"))
    )


def test_partitioned_second_insert_shares_write_ids(spark, tmp_path):
    """Write ids are TABLE-wide (Hive allocates per table): a second
    insert lands as delta_2_2 in every partition it touches."""
    t = _fresh(tmp_path, "pacid2")
    hive_acid_insert(spark, t, _df(spark, 0, 9), key_col="id",
                     partition_col="ds")
    wid = hive_acid_insert(spark, t, _df(spark, 9, 12), key_col="id",
                           partition_col="ds")
    assert wid == 2
    assert os.path.isdir(os.path.join(t, "ds=0", "delta_2_2"))
    assert _ids(spark, t) == list(range(12))


def test_partitioned_delete_and_update(spark, tmp_path):
    t = _fresh(tmp_path, "pacid3")
    hive_acid_insert(spark, t, _df(spark, 0, 30), key_col="id",
                     partition_col="ds")
    # predicate can mix row columns and the partition column
    n = hive_acid_delete(spark, t, "row.id >= 24 AND ds = '0'")
    assert n == 2  # ids 24, 27
    assert os.path.isdir(os.path.join(t, "ds=0", "delete_delta_2_2"))
    assert not os.path.isdir(os.path.join(t, "ds=1", "delete_delta_2_2"))
    assert _ids(spark, t) == [i for i in range(30) if i not in (24, 27)]
    n = hive_acid_update(spark, t, "row.id = 5", {"v": "500.0"},
                         key_col="id")
    assert n == 1
    got = {r["id"]: (r["v"], r["ds"])
           for r in hive_acid_scan(spark, t).collect()}
    assert got[5] == (500.0, "2")  # updated in place, partition kept
    assert got[4] == (4.0, "1")
    with pytest.raises(ValueError, match="partition column"):
        hive_acid_update(spark, t, "row.id = 5", {"ds": "'9'"},
                         key_col="id")


def test_partitioned_major_compaction_per_partition(spark, tmp_path):
    t = _fresh(tmp_path, "pacid4")
    hive_acid_insert(spark, t, _df(spark, 0, 15), key_col="id",
                     partition_col="ds")
    hive_acid_insert(spark, t, _df(spark, 15, 30), key_col="id",
                     partition_col="ds")
    hive_acid_delete(spark, t, "row.id % 10 = 0")
    before = _ids(spark, t)
    res = hive_acid_compact(spark, t, mode="major")
    assert set(res["partitions"]) == {"ds=0", "ds=1", "ds=2"}
    for p in ("ds=0", "ds=1", "ds=2"):
        assert os.path.isdir(os.path.join(t, p, "base_3"))
        assert not any(
            d.startswith(("delta_", "delete_delta_"))
            for d in os.listdir(os.path.join(t, p))
        )
    assert _ids(spark, t) == before
    # single-partition compaction honors the partition argument
    t2 = _fresh(tmp_path, "pacid4b")
    hive_acid_insert(spark, t2, _df(spark, 0, 9), key_col="id",
                     partition_col="ds")
    hive_acid_insert(spark, t2, _df(spark, 9, 18), key_col="id",
                     partition_col="ds")
    res = hive_acid_compact(spark, t2, mode="minor", partition="ds=1")
    assert res["partitions"]["ds=1"]["merged"] == {"delta": (1, 2)}
    assert os.path.isdir(os.path.join(t2, "ds=1", "delta_1_2"))
    assert os.path.isdir(os.path.join(t2, "ds=0", "delta_1_1"))
    assert _ids(spark, t2) == list(range(18))


def test_flat_insert_into_partitioned_rejected(spark, tmp_path):
    t = _fresh(tmp_path, "pacid5")
    hive_acid_insert(spark, t, _df(spark, 0, 6), key_col="id",
                     partition_col="ds")
    with pytest.raises(ValueError, match="partitioned"):
        hive_acid_insert(spark, t, _df(spark, 6, 9), key_col="id")


# ---------------------------------------------------------------------------
# upgraded tables: original_ files
# ---------------------------------------------------------------------------


def test_original_files_synthesized_rowids(spark, tmp_path):
    """A converted pre-ACID table: plain ORC files read with synthesized
    ROW__IDs (write-id 0, bucket from file name, in-file ordinal)."""
    t = _fresh(tmp_path, "oacid1")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    n_files = hive_acid_seed_originals(spark, t, df, key_col="id",
                                       n_buckets=2)
    assert n_files == 2
    assert sorted(os.listdir(t)) == ["000000_0", "000001_0"]
    hive_acid_convert(t)
    assert _ids(spark, t) == list(range(20))
    rid = hive_acid_scan(spark, t, with_row_id=True)
    rows = rid.select("originalTransaction", "bucket", "rowId").collect()
    assert {r["originalTransaction"] for r in rows} == {0}
    assert {r["bucket"] for r in rows} == {0, 1}
    # rowIds are unique within (writeid 0, bucket)
    seen = [(r["bucket"], r["rowId"]) for r in rows]
    assert len(seen) == len(set(seen)) == 20


def test_original_files_acid_dml_on_top(spark, tmp_path):
    """Deletes/updates/inserts written AFTER conversion target the
    synthesized ROW__IDs; major compaction folds originals into base_N
    and removes them."""
    t = _fresh(tmp_path, "oacid2")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    hive_acid_seed_originals(spark, t, df, key_col="id")
    hive_acid_convert(t)
    wid = hive_acid_insert(
        spark, t,
        spark.createDataFrame([(20, 20.0), (21, 21.0)],
                              "id long, v double"),
        key_col="id",
    )
    assert wid == 1
    n = hive_acid_delete(spark, t, "row.id % 5 = 0")
    assert n == 5  # 0,5,10,15,20
    assert _ids(spark, t) == [i for i in range(22) if i % 5]
    before = _ids(spark, t)
    res = hive_acid_compact(spark, t, mode="major")
    assert res["folded"] == 4  # 2 original files + delta + delete_delta
    assert not any(f.endswith("_0") for f in os.listdir(t))
    assert os.path.isdir(os.path.join(t, "base_2"))
    assert _ids(spark, t) == before


def test_original_files_partitioned(spark, tmp_path):
    t = _fresh(tmp_path, "oacid3")
    hive_acid_seed_originals(spark, t, _df(spark, 0, 18), key_col="id",
                             partition_col="ds")
    hive_acid_convert(t)
    assert os.path.exists(os.path.join(t, "ds=0", "000000_0"))
    assert _ids(spark, t) == list(range(18))
    assert _ids(spark, t, partition_filters=[("ds", "=", "2")]) == [
        i for i in range(18) if i % 3 == 2
    ]


# ---------------------------------------------------------------------------
# insert-only (MM) tables
# ---------------------------------------------------------------------------


def test_insert_only_scan_and_contract(spark, tmp_path):
    t = _fresh(tmp_path, "mmacid1")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    )
    wid = hive_acid_insert_only(spark, t, df, key_col="id")
    assert wid == 1
    assert os.path.exists(os.path.join(t, "_insert_only"))
    # delta files are RAW -- no ACID columns on disk
    import pyarrow.orc as pao

    d = os.path.join(t, "delta_1_1")
    f = os.path.join(d, sorted(os.listdir(d))[0])
    assert pao.ORCFile(f).schema.names == ["id", "v"]
    hive_acid_insert_only(
        spark, t,
        spark.createDataFrame([(10, 10.0)], "id long, v double"),
        key_col="id",
    )
    assert _ids(spark, t) == list(range(11))
    # MM contract: DELETE/UPDATE rejected, full-ACID insert rejected
    with pytest.raises(ValueError, match="insert-only"):
        hive_acid_delete(spark, t, "row.id = 1")
    with pytest.raises(ValueError, match="insert-only"):
        hive_acid_update(spark, t, "row.id = 1", {"v": "9.0"})
    with pytest.raises(ValueError, match="insert-only"):
        hive_acid_insert(spark, t, df, key_col="id")


def test_insert_only_compaction_stays_raw(spark, tmp_path):
    t = _fresh(tmp_path, "mmacid2")
    for lo in (0, 5, 10):
        hive_acid_insert_only(
            spark, t,
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 5)],
                "id long, v double",
            ),
            key_col="id",
        )
    res = hive_acid_compact(spark, t, mode="minor")
    assert res["merged"] == {"delta": (1, 3)}
    assert _ids(spark, t) == list(range(15))
    hive_acid_insert_only(
        spark, t,
        spark.createDataFrame([(15, 15.0)], "id long, v double"),
        key_col="id",
    )
    res = hive_acid_compact(spark, t, mode="major")
    assert os.path.isdir(os.path.join(t, "base_4"))
    import pyarrow.orc as pao

    b = os.path.join(t, "base_4")
    f = os.path.join(b, sorted(os.listdir(b))[0])
    assert pao.ORCFile(f).schema.names == ["id", "v"]  # base stays raw
    assert _ids(spark, t) == list(range(16))
