"""Pins for the mergeable distinct-count state (plans/pipeline27.py).

agg_bitmap_distinct is oracle-checked (exact); here we pin the HLL
sketch lifecycle invariants that the rows-only check can't: merging
daily sketches loses nothing vs sketching the month directly, and the
estimate lands within HLL's error envelope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.plans.pipeline27 import sketch_hll_mergeable
from hive_person_service_spark.sources import load_table

from conftest import SF_SMALL


def test_hll_union_of_daily_equals_direct_monthly(spark):
    ev = load_table(spark, SF_SMALL, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = (
        daily.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = (
        ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
    )
    m = {r.month: r.est for r in merged.collect()}
    d = {r.month: r.est for r in direct.collect()}
    assert m.keys() == d.keys() and len(m) > 0
    # HLL union is lossless vs sketching the union directly (same lgK).
    assert m == d


def test_hll_estimate_error_bounded(spark):
    rows = sketch_hll_mergeable(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.exact_users > 0
        assert abs(r.est_users - r.exact_users) / r.exact_users < 0.05
