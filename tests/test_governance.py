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
