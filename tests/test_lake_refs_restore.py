"""Behavioral pins for Delta RESTORE (sources/delta_log.py) and Iceberg
refs/branches (sources/iceberg.py) — the layout-level guarantees the
oracle-checked queries (table_delta_restore, table_iceberg_refs) rest on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.sources import load_table
from hive_person_service_spark.sources.delta_log import (
    delta_delete,
    delta_history,
    delta_restore,
    delta_scan,
    delta_write,
)
from hive_person_service_spark.sources.iceberg import (
    iceberg_expire_snapshots,
    iceberg_scan,
    iceberg_set_ref,
    iceberg_write,
)


def _sup(spark):
    return load_table(spark, SF_SMALL, "supplier")


def test_delta_restore_round_trips_a_delete(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    delta_write(sup.where(F.col("s_suppkey") % 2 == 0), t)
    delta_write(sup.where(F.col("s_suppkey") % 2 == 1), t)
    full = sup.count()
    n_del = sup.where(F.col("s_suppkey") % 5 == 0).count()
    assert n_del > 0, "fixture needs matching keys"
    delta_delete(spark, t, "s_suppkey % 5 = 0")
    assert delta_scan(spark, t).count() == full - n_del
    res = delta_restore(t, 1)
    assert res["version"] == 3
    assert delta_scan(spark, t).count() == full
    # history records the RESTORE commit
    hist = delta_history(t)
    assert hist[-1]["operation"] == "RESTORE"
    # time travel ABOVE the restore still sees the deleted state
    assert delta_scan(spark, t, version_as_of=2).count() == full - n_del
    # and the restored snapshot's file set equals version 1's
    from hive_person_service_spark.sources.delta_log import _snapshot

    f1, _m, _p, _v = _snapshot(t, 1)
    f3, _m, _p, _v = _snapshot(t, 3)
    assert set(f1) == set(f3)


def test_delta_restore_to_version_zero_and_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    delta_write(sup.where(F.col("s_suppkey") % 2 == 0), t)
    delta_write(sup.where(F.col("s_suppkey") % 2 == 1), t)
    delta_restore(t, 0)
    even = sup.where(F.col("s_suppkey") % 2 == 0).count()
    assert delta_scan(spark, t).count() == even
    # restoring to an identical state commits nothing
    head = delta_history(t)[-1]["version"]
    res = delta_restore(t, head)
    assert res == {"version": head, "added": 0, "removed": 0}
    assert delta_history(t)[-1]["version"] == head


def test_iceberg_tag_is_immutable_as_main_advances(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    base = iceberg_write(sup.where(F.col("s_suppkey") % 3 == 0), t)
    iceberg_set_ref(t, "rel1", "tag", base)
    iceberg_write(sup.where(F.col("s_suppkey") % 3 == 1), t)
    n0 = sup.where(F.col("s_suppkey") % 3 == 0).count()
    n01 = sup.where(F.col("s_suppkey") % 3 != 2).count()
    assert iceberg_scan(spark, t, ref="rel1").count() == n0
    assert iceberg_scan(spark, t, ref="main").count() == n01
    assert iceberg_scan(spark, t).count() == n01  # default == main


def test_iceberg_branch_isolates_both_ways(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    base = iceberg_write(sup.where(F.col("s_suppkey") % 3 == 0), t)
    iceberg_set_ref(t, "exp", "branch", base)
    iceberg_write(sup.where(F.col("s_suppkey") % 3 == 1), t)  # main
    iceberg_write(sup.where(F.col("s_suppkey") % 3 == 2), t, branch="exp")
    n = {
        k: sup.where(F.col("s_suppkey") % 3 == k).count() for k in (0, 1, 2)
    }
    assert iceberg_scan(spark, t, ref="exp").count() == n[0] + n[2]
    assert iceberg_scan(spark, t, ref="main").count() == n[0] + n[1]
    # a second branch append chains on the branch head
    extra = sup.where(F.col("s_suppkey") % 3 == 1).limit(5).cache()
    n_extra = extra.count()
    assert n_extra > 0
    iceberg_write(extra, t, branch="exp")
    assert (
        iceberg_scan(spark, t, ref="exp").count() == n[0] + n[2] + n_extra
    )
    assert iceberg_scan(spark, t, ref="main").count() == n[0] + n[1]


def test_iceberg_ref_errors_are_precise(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    base = iceberg_write(sup.limit(10), t)
    iceberg_set_ref(t, "rel1", "tag", base)
    with pytest.raises(ValueError, match="unknown ref"):
        iceberg_scan(spark, t, ref="nope")
    with pytest.raises(ValueError, match="not a branch ref"):
        iceberg_write(sup.limit(1), t, branch="rel1")  # tags are immutable
    with pytest.raises(ValueError, match="not a branch ref"):
        iceberg_write(sup.limit(1), t, branch="nope")
    with pytest.raises(ValueError, match="not in the table's snapshot log"):
        iceberg_set_ref(t, "x", "tag", 123456789)
    with pytest.raises(ValueError, match="'main'"):
        iceberg_set_ref(t, "main", "tag", base)


def test_iceberg_expire_keeps_ref_snapshots(spark, tmp_path):
    t = str(tmp_path / "t")
    sup = _sup(spark)
    base = iceberg_write(sup.where(F.col("s_suppkey") % 3 == 0), t)
    iceberg_set_ref(t, "rel1", "tag", base)
    iceberg_write(sup.where(F.col("s_suppkey") % 3 == 1), t)
    iceberg_write(sup.where(F.col("s_suppkey") % 3 == 2), t)
    res = iceberg_expire_snapshots(spark, t, keep_last=1)
    assert res["expired"] == 1  # only the untagged middle snapshot
    # the tagged base stays fully readable after expiry
    n0 = sup.where(F.col("s_suppkey") % 3 == 0).count()
    assert iceberg_scan(spark, t, ref="rel1").count() == n0


# ---------------------------------------------------------------------------
# Hudi savepoint + restore (round 11: four-format disaster-recovery parity)
# ---------------------------------------------------------------------------


def _hudi_3commits(spark, t):
    from hive_person_service_spark.sources.hudi import hudi_timeline, hudi_write

    sup = _sup(spark)
    hudi_write(spark, t, sup.where(F.col("s_suppkey") % 2 == 0),
               record_key="s_suppkey")
    hudi_write(
        spark, t,
        sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
            "s_acctbal", F.col("s_acctbal") + 1000.0
        ),
        record_key="s_suppkey",
    )
    hudi_write(
        spark, t,
        sup.where(F.col("s_suppkey") % 4 == 0).withColumn(
            "s_acctbal", F.lit(-1.0)
        ),
        record_key="s_suppkey",
    )
    return [e["instant"] for e in hudi_timeline(t)]


def test_hudi_restore_to_savepoint(spark, tmp_path):
    from hive_person_service_spark.sources.hudi import (
        hudi_restore,
        hudi_savepoint,
        hudi_scan,
        hudi_timeline,
    )

    t = str(tmp_path / "hsp")
    instants = _hudi_3commits(spark, t)
    assert len(instants) == 3
    # the pre-restore time-travel read IS the certification target
    want = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t, as_of=instants[1]).collect()
    )
    sp = hudi_savepoint(t, instants[1], user="tester", comment="pin v2")
    assert sp["instant"] == instants[1] and sp["files"] > 0
    # idempotent
    again = hudi_savepoint(t, instants[1])
    assert again.get("existing") is True
    res = hudi_restore(t, instants[1])
    assert res["rolled_back"] == [instants[2]]
    assert res["files_deleted"] > 0
    got = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t).collect()
    )
    assert got == want, "restored snapshot != pre-restore time travel"
    assert [e["instant"] for e in hudi_timeline(t)] == instants[:2]
    # restore without a savepoint refuses
    with pytest.raises(ValueError, match="requires one"):
        hudi_restore(t, instants[0])


def test_hudi_savepoint_pins_through_clean(spark, tmp_path):
    from hive_person_service_spark.sources.hudi import (
        hudi_clean,
        hudi_restore,
        hudi_savepoint,
        hudi_scan,
        hudi_timeline,
    )

    t = str(tmp_path / "hspc")
    instants = _hudi_3commits(spark, t)
    want = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t, as_of=instants[1]).collect()
    )
    hudi_savepoint(t, instants[1])
    res = hudi_clean(spark, t, keep_versions=1)
    # clean ran, but the savepointed slice's files survived: time travel
    # at the savepointed instant still serves past the boundary...
    got = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t, as_of=instants[1]).collect()
    )
    assert got == want
    # ...and an UNsavepointed pre-boundary instant still refuses
    if res["earliest_commit_to_retain"]:
        with pytest.raises(ValueError, match="clean retention"):
            hudi_scan(spark, t, as_of=instants[0]).collect()
    # restore still lands on the pinned snapshot after the clean
    hudi_restore(t, instants[1])
    got = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t).collect()
    )
    assert got == want
    assert [e["instant"] for e in hudi_timeline(t)] == instants[:2]


def test_hudi_restore_mor_drops_logs(spark, tmp_path):
    from hive_person_service_spark.sources.hudi import (
        hudi_restore,
        hudi_savepoint,
        hudi_scan,
        hudi_write,
    )

    t = str(tmp_path / "hmor")
    sup = _sup(spark)
    hudi_write(spark, t, sup, record_key="s_suppkey", table_type="mor")
    from hive_person_service_spark.sources.hudi import hudi_timeline

    first = hudi_timeline(t)[0]["instant"]
    want = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t).collect()
    )
    hudi_savepoint(t, first)
    hudi_write(
        spark, t,
        sup.where(F.col("s_suppkey") % 7 == 0).withColumn(
            "s_acctbal", -F.col("s_acctbal")
        ),
        record_key="s_suppkey", table_type="mor",
    )  # deltacommit: log blocks
    res = hudi_restore(t, first)
    assert res["files_deleted"] > 0
    got = sorted(
        (r["s_suppkey"], round(r["s_acctbal"], 2))
        for r in hudi_scan(spark, t).collect()
    )
    assert got == want
    # a fresh write after restore lands cleanly
    hudi_write(
        spark, t,
        sup.where(F.col("s_suppkey") == 1).withColumn(
            "s_acctbal", F.lit(9.0)
        ),
        record_key="s_suppkey", table_type="mor",
    )
    rows = {r["s_suppkey"]: round(r["s_acctbal"], 2)
            for r in hudi_scan(spark, t).collect()}
    assert rows.get(1) == 9.0
