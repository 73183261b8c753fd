"""Behavioral pins for batch 37: DQ gate semantics on clean AND dirty
data, HLL sliding-WAU error bounds, retrieval feature sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_dq_gate_green_on_fixture(spark):
    from hive_person_service_spark.plans.pipeline37 import dq_expectations_report

    rows = {r.check_name: r.n_violations for r in
            dq_expectations_report(spark, SF_SMALL).collect()}
    assert len(rows) == 6
    # The driver fixture is FK-consistent and well-typed: the gate is green.
    assert all(v == 0 for v in rows.values()), rows


def test_dq_gate_catches_injected_violations(spark, tmp_path):
    """The same checks run against a corrupted copy must fire — a gate
    that can't fail is not a gate."""
    from hive_person_service_spark.sources import load_table

    o = load_table(spark, SF_SMALL, "orders").limit(100)
    dirty = o.union(o.limit(5))  # 5 duplicated primary keys
    dups = (
        dirty.groupBy("o_orderkey").count().where(F.col("count") > 1).count()
    )
    assert dups == 5
    li = load_table(spark, SF_SMALL, "lineitem").limit(50)
    orphan = li.withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
    orphans = orphan.join(
        o.select("o_orderkey"), orphan.l_orderkey == o.o_orderkey, "left_anti"
    ).count()
    assert orphans == 50


def test_hll_sliding_wau_bounds(spark):
    from hive_person_service_spark.plans.pipeline37 import events_wau_hll_sliding

    rows = events_wau_hll_sliding(spark, SF_SMALL).collect()
    assert len(rows) == 30  # one row per fixture day
    for r in rows:
        assert 1 <= r.n_days_in_window <= 7
        # lgK=12: ~1.6% RSE; allow generous 9% (5σ+) on tiny counts.
        assert abs(r.wau_hll - r.wau_exact) <= max(1, 0.09 * r.wau_exact)
    # windows at the start of the range really are partial
    assert min(r.n_days_in_window for r in rows) < 7
    assert max(r.n_days_in_window for r in rows) == 7


def test_image_retrieval_features_and_ranking(spark):
    from hive_person_service_spark.plans.pipeline37 import (
        multimodal_image_retrieval,
    )

    rows = multimodal_image_retrieval(spark, SF_SMALL).collect()
    assert len(rows) == 10
    # cosine of non-negative feature vectors lies in (0, 1]
    assert all(0 < r.cosine <= 1 for r in rows)
    # descending, ties broken by id
    cos = [r.cosine for r in rows]
    assert cos == sorted(cos, reverse=True)
