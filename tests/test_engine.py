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
