"""Governance operators: GDPR erasure receipts + idempotence, pseudonym
stability and join integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.operators.governance import (
    erase_rows,
    pseudonymize,
)
from hive_person_service_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_erase_rows_receipt_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "customer")
    c = load_table(spark, SF_SMALL, "customer")
    c.write.parquet(path)
    n = c.count()

    doomed = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    receipt = erase_rows(spark, path, doomed, "c_custkey")
    assert receipt == {"rows_before": n, "rows_after": n - 3, "erased": 3}

    survivors = spark.read.parquet(path)
    assert survivors.where(F.col("c_custkey").isin(1, 2, 3)).count() == 0
    # untouched rows are intact
    assert survivors.count() == n - 3
    assert (
        survivors.join(c, "c_custkey").count() == n - 3
    )

    # erasing the same keys again is a no-op
    receipt2 = erase_rows(spark, path, doomed, "c_custkey")
    assert receipt2["erased"] == 0


def test_pseudonymize_stability_and_join_integrity(spark):
    c = load_table(spark, SF_SMALL, "customer")
    o = load_table(spark, SF_SMALL, "orders")
    pc = pseudonymize(c, "c_custkey", salt="s1", drop=["c_name"])
    po = pseudonymize(
        o.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey", salt="s1"
    )
    # same salt -> joins survive pseudonymization
    n_direct = c.join(o, c.c_custkey == o.o_custkey).count()
    assert pc.join(po, "pseudo_id").count() == n_direct
    # different salt -> disjoint key space
    pc2 = pseudonymize(c, "c_custkey", salt="s2")
    assert pc.join(pc2, "pseudo_id").count() == 0
    # identifiers are gone
    assert "c_custkey" not in pc.columns and "c_name" not in pc.columns


def test_engine_governance_wrappers(spark, tmp_path):
    from hive_person_service_spark.engine import Engine

    eng = Engine(spark)
    path = str(tmp_path / "t")
    load_table(spark, SF_SMALL, "customer").write.parquet(path)
    r = eng.erase(path, spark.createDataFrame([(5,)], ["c_custkey"]), "c_custkey")
    assert r["erased"] == 1
    p = eng.pseudonymize(
        load_table(spark, SF_SMALL, "customer"), "c_custkey", "s", drop=["c_name"]
    )
    assert "pseudo_id" in p.columns and "c_name" not in p.columns


def test_schema_evolution_merge_read(spark, tmp_path):
    # Lake reality: new columns appear over time; mergeSchema reads the
    # union schema with nulls backfilled for old files.
    path = str(tmp_path / "evolving")
    c = load_table(spark, SF_SMALL, "customer")
    c.select("c_custkey", "c_mktsegment").write.parquet(path + "/batch=1")
    c.select(
        "c_custkey", "c_mktsegment", F.lit("v2").alias("ingest_tag")
    ).write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"c_custkey", "c_mktsegment", "ingest_tag"}
    n = c.count()
    assert merged.count() == 2 * n
    assert merged.where(F.col("ingest_tag").isNull()).count() == n


def test_snapshot_expire_retention(spark, tmp_path):
    from hive_person_service_spark.operators.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "snap"))
    c = load_table(spark, SF_SMALL, "customer")
    for i in range(1, 5):
        t.write(c.limit(i * 10), note=f"v{i}")
    expired = t.expire(keep_last=2)
    assert expired == [1, 2]
    assert [e["version"] for e in t.history()] == [3, 4]
    assert t.read().count() == 40          # current still readable
    assert t.read(3).count() == 30         # horizon version readable
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read(1)                          # expired => gone, loudly
