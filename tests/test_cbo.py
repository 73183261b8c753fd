"""Cost-based optimization: ANALYZE'd catalog tables feed rowCount/NDV
stats into Catalyst (SURVEY.md §4 join-reorder row -- opt-in, enabled by
operators/cbo.py)."""

from __future__ import annotations

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.cbo import (
    enable_cbo,
    persist_and_analyze,
    plan_stats,
)
from hive_person_service_spark.sources import load_table


def test_analyzed_tables_feed_cbo(spark):
    enable_cbo(spark)
    li = persist_and_analyze(
        spark, load_table(spark, SF_SMALL, "lineitem"), "cbo_t_li"
    )
    o = persist_and_analyze(
        spark, load_table(spark, SF_SMALL, "orders"), "cbo_t_o"
    )
    try:
        # exact row counts reach the optimizer (path-based reads get None)
        assert plan_stats(li)[0] == li.count()
        assert plan_stats(o)[0] == o.count()
        raw = load_table(spark, SF_SMALL, "lineitem")
        assert plan_stats(raw)[0] is None

        # column stats (histogram) give the optimizer a selectivity-reduced
        # rowCount for a range predicate, not just a size guess
        sel, _ = plan_stats(o.where(o.o_totalprice > 400_000))
        assert sel is not None and sel < o.count() / 2

        # the equi-join gets an NDV-based cardinality estimate, far below
        # the cartesian bound a stats-less planner would have to assume
        est, _ = plan_stats(li.join(o, li.l_orderkey == o.o_orderkey))
        assert est is not None
        assert est < li.count() * o.count() / 100
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_t_li")
        spark.sql("DROP TABLE IF EXISTS cbo_t_o")
