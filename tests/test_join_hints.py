"""Join strategy hints (the Spark face of Hive's /*+ MAPJOIN */ etc.):
pin that each hint actually flips the physical join strategy, and that
hinted plans return the same rows. At 100 TB these are the manual
overrides when stats mislead the planner (e.g. forcing a shuffle-hash
join for a mid-size dimension that would sort-merge by default)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.sources import load_table
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _orders_customers(spark):
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    return o, c


def test_broadcast_hint(spark):
    o, c = _orders_customers(spark)
    j = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_shuffle_hash_hint(spark):
    o, c = _orders_customers(spark)
    j = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in _plan(j)


def test_merge_hint(spark):
    o, c = _orders_customers(spark)
    j = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in _plan(j)


def test_hints_agree_on_results(spark):
    o, c = _orders_customers(spark)
    base = None
    for hint in ["broadcast", "shuffle_hash", "merge"]:
        rows = (
            o.join(c.hint(hint), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
            .orderBy("c_mktsegment")
            .collect()
        )
        if base is None:
            base = rows
        else:
            assert rows == base, hint
