"""SCD2 profile-history operator (operators/scd.py) + its streaming
foreachBatch integration (streaming/jobs.py::stream_scd2_profiles)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.sources import load_table
from hive_person_service_spark.operators.scd import (
    scd2_as_of,
    scd2_current,
    scd2_init,
    scd2_merge,
    scd2_validate,
)


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, with_ts="ts"):
    return spark.createDataFrame(rows)


def test_scd2_merge_semantics(spark):
    base = spark.createDataFrame(
        [
            Row(uid=1, plan="free", ts=_ts("2024-01-01")),
            Row(uid=2, plan="pro", ts=_ts("2024-01-01")),
            Row(uid=3, plan=None, ts=_ts("2024-01-01")),
        ]
    )
    hist = scd2_init(base, "ts")
    updates = spark.createDataFrame(
        [
            # uid1: real change, then an in-batch consecutive no-op, then
            # another change -> exactly 2 new versions
            Row(uid=1, plan="pro", ts=_ts("2024-02-01")),
            Row(uid=1, plan="pro", ts=_ts("2024-02-15")),
            Row(uid=1, plan="team", ts=_ts("2024-03-01")),
            # uid2: no-op vs the open row -> dropped entirely
            Row(uid=2, plan="pro", ts=_ts("2024-02-01")),
            # uid3: NULL -> NULL no-op vs open row -> dropped (null-safe)
            Row(uid=3, plan=None, ts=_ts("2024-02-01")),
            # uid4: brand-new key, NULL attribute -> must insert, not drop
            Row(uid=4, plan=None, ts=_ts("2024-02-01")),
        ]
    )
    merged = scd2_merge(hist, updates, ["uid"], ["plan"], "ts").cache()

    assert scd2_validate(merged, ["uid"]) == {
        "open_per_key": 0,
        "bad_interval": 0,
        "overlap_or_gap": 0,
        "flag_mismatch": 0,
    }
    # uid1: init + 2 surviving versions; uid2/uid3: untouched; uid4: 1 row
    counts = {
        r["uid"]: r["n"]
        for r in merged.groupBy("uid").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 3, 2: 1, 3: 1, 4: 1}

    cur = {r["uid"]: r["plan"] for r in scd2_current(merged).collect()}
    assert cur == {1: "team", 2: "pro", 3: None, 4: None}

    asof = {r["uid"]: r["plan"] for r in scd2_as_of(merged, "2024-02-20").collect()}
    assert asof == {1: "pro", 2: "pro", 3: None, 4: None}
    # before any update: initial values, uid4 absent
    asof0 = {r["uid"]: r["plan"] for r in scd2_as_of(merged, "2024-01-15").collect()}
    assert asof0 == {1: "free", 2: "pro", 3: None}

    # second batch on top of the merged history: close uid4's NULL row
    batch2 = spark.createDataFrame([Row(uid=4, plan="free", ts=_ts("2024-04-01"))])
    merged2 = scd2_merge(merged, batch2, ["uid"], ["plan"], "ts")
    assert scd2_validate(merged2, ["uid"])["open_per_key"] == 0
    assert {r["uid"]: r["plan"] for r in scd2_current(merged2).collect()}[4] == "free"


def test_scd2_idempotent_replay(spark):
    """Re-applying an already-applied batch is a no-op (the foreachBatch
    at-least-once story)."""
    base = spark.createDataFrame([Row(uid=1, plan="free", ts=_ts("2024-01-01"))])
    hist = scd2_init(base, "ts")
    batch = spark.createDataFrame([Row(uid=1, plan="pro", ts=_ts("2024-02-01"))])
    once = scd2_merge(hist, batch, ["uid"], ["plan"], "ts").cache()
    twice = scd2_merge(once, batch, ["uid"], ["plan"], "ts")
    assert twice.count() == once.count() == 2
    assert scd2_validate(twice, ["uid"])["open_per_key"] == 0


def test_scd2_on_customer_fixture(spark):
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    hist = scd2_init(
        cust.withColumn("ts", F.lit("2024-01-01").cast("timestamp")), "ts"
    )
    updates = (
        cust.where(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
        .withColumn("ts", F.lit("2024-06-01").cast("timestamp"))
    )
    merged = scd2_merge(
        hist, updates, ["c_custkey"], ["c_acctbal", "c_mktsegment"], "ts"
    ).cache()
    assert scd2_validate(merged, ["c_custkey"]) == {
        "open_per_key": 0,
        "bad_interval": 0,
        "overlap_or_gap": 0,
        "flag_mismatch": 0,
    }
    n_updated = updates.count()
    assert merged.count() == cust.count() + n_updated
    # point-in-time before the update batch == the original snapshot
    before = scd2_as_of(merged, "2024-03-01").select("c_custkey", "c_acctbal")
    assert before.exceptAll(cust.select("c_custkey", "c_acctbal")).count() == 0


def test_stream_scd2_profiles(spark, tmp_path):
    from hive_person_service_spark.streaming.jobs import stream_scd2_profiles

    hist_path = str(tmp_path / "profiles_scd2")
    stream_scd2_profiles(spark, SF_SMALL, hist_path)

    hist = spark.read.parquet(hist_path).cache()
    assert scd2_validate(hist, ["user_id"]) == {
        "open_per_key": 0,
        "bad_interval": 0,
        "overlap_or_gap": 0,
        "flag_mismatch": 0,
    }
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    assert scd2_current(hist).count() == n_users
    # every user's current balance = value of their latest event (ties on
    # event ts cannot occur in the fixture: µs precision, checked non-flaky)
    latest = (
        load_table(spark, SF_SMALL, "events")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("balance"))
    )
    cur = scd2_current(hist).select("user_id", "balance")
    assert cur.exceptAll(latest).count() == 0
