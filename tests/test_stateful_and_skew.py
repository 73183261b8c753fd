"""Arbitrary stateful streaming smoke (state accumulates across
micro-batches and converges to the batch aggregate) + salted-join
equivalence + CBO/ANALYZE surface."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.skew import salted_join
from hive_person_service_spark.sinks import write_bucketed_table
from hive_person_service_spark.sources import load_table
from hive_person_service_spark.streaming import read_events_stream, run_to_memory_sink
from hive_person_service_spark.streaming.stateful import running_user_totals


def test_stateful_totals_converge_to_batch(spark):
    stream = read_events_stream(spark, SF_SMALL)
    got = run_to_memory_sink(running_user_totals(stream), spark, "update")
    # last update per user == full batch aggregate
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in got.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(want)
    for u, (n, total) in want.items():
        assert final[u][0] == n
        assert abs(final[u][1] - total) < 1e-6


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs the protobuf runtime "
    "(broken in this container); stateful.py covers the semantics",
)
def test_stateful_v2_totals_converge_to_batch(spark):
    from hive_person_service_spark.streaming.stateful_v2 import (
        running_user_totals_v2,
    )

    stream = read_events_stream(spark, SF_SMALL)
    got = run_to_memory_sink(running_user_totals_v2(stream), spark, "update")
    agg = {r.user_id: r.n for r in got.groupBy("user_id")
           .agg(F.max("n_events").alias("n")).collect()}
    want = {
        r.user_id: r.n
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert agg == want


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    li2 = li.withColumnRenamed("l_orderkey", "k")
    o2 = o.withColumnRenamed("o_orderkey", "k")
    salted = salted_join(li2, o2, on="k", left_unique_col="l_suppkey", n_salts=4)
    plain = li2.join(o2, "k")
    assert salted.count() == plain.count()
    a = sorted((r.k, r.l_linenumber, r.o_totalprice) for r in salted.collect())
    b = sorted((r.k, r.l_linenumber, r.o_totalprice) for r in plain.collect())
    assert a == b


def test_cbo_analyze_table_stats(spark):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    o = load_table(spark, SF_SMALL, "orders")
    write_bucketed_table(o, "orders_stats", "o_orderkey", 4)
    spark.sql("ANALYZE TABLE orders_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    desc = spark.sql("DESCRIBE EXTENDED orders_stats").collect()
    stats = {r.col_name: r.data_type for r in desc}
    assert "Statistics" in stats, stats  # rowCount + sizeInBytes recorded
    assert "1500 rows" in stats["Statistics"]