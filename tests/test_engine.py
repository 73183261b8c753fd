"""Engine facade: the one-import user surface."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.engine import Engine


def test_engine_facade_end_to_end(spark):
    eng = Engine(spark).attach(SF_SMALL)

    # catalog + SQL surface
    rev = eng.sql(
        "SELECT ROUND(SUM(o_totalprice), 2) AS s FROM orders"
    ).collect()[0].s
    assert rev > 0

    # DataFrame surface
    assert eng.table("customer").count() == 150

    # composite operators
    top = eng.top_orders_per_customer(k=1)
    assert top.count() == eng.table("orders").select("o_custkey").distinct().count()

    assert eng.dedup(eng.table("documents")).count() == 500

    qv = np.array(
        eng.table("embeddings").where(F.col("vec_id") == 0).first()["embedding"],
        dtype=np.float64,
    )
    nn = eng.topk_similar(qv, k=5, nprobe=16).collect()
    assert len(nn) == 5
    assert nn[0].vec_id == 0 and nn[0].cos == 1.0  # the query vector itself


def test_engine_scd2_and_skipping(spark, tmp_path):
    eng = Engine(spark).attach(SF_SMALL)

    # SCD2 wrappers: bootstrap from customer, apply one update, time travel
    from hive_person_service_spark.operators.scd import scd2_init

    cust = eng.table("customer").select("c_custkey", "c_acctbal")
    hist = scd2_init(
        cust.withColumn("ts", F.lit("2024-01-01").cast("timestamp")), "ts"
    )
    upd = spark.createDataFrame(
        [(1, 999.0)], "c_custkey long, c_acctbal double"
    ).withColumn("ts", F.lit("2024-06-01").cast("timestamp"))
    merged = eng.scd2_merge(hist, upd, ["c_custkey"], ["c_acctbal"])
    got = {
        r["c_custkey"]: r["c_acctbal"]
        for r in eng.profile_as_of(merged, "2024-07-01")
        .where(F.col("c_custkey") == 1)
        .collect()
    }
    assert got[1] == 999.0

    # skipping wrappers: index a range layout, pruned scan == filter
    path = str(tmp_path / "orders_ranged")
    eng.table("orders").repartitionByRange(4, "o_totalprice").write.parquet(path)
    stats = eng.stats_index(path, ["o_totalprice"])
    pruned = eng.range_scan(path, stats, "o_totalprice", 50_000.0, 80_000.0)
    full = spark.read.parquet(path).where(
        F.col("o_totalprice").between(50_000.0, 80_000.0)
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
