"""Round-6 regression pins for the ADVICE fixes that don't belong to an
existing suite: session-conf hygiene of sql_recursive_cte."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_recursive_cte_restores_recursion_limit(spark):
    """The query raises cteRecursionRowLimit for its own materialization
    only -- the session-wide runaway-recursion guard must be back in place
    (previous value or default) after the call returns."""
    spark.conf.set("spark.sql.cteRecursionRowLimit", "123456")
    try:
        from hive_person_service_spark.plans.extras4 import sql_recursive_cte

        out = sql_recursive_cte(spark, SF_SMALL)
        assert out.count() > 0  # materialized result survives the restore
        assert spark.conf.get("spark.sql.cteRecursionRowLimit") == "123456"
    finally:
        spark.conf.unset("spark.sql.cteRecursionRowLimit")
