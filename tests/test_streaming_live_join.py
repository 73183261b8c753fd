"""Batch-twin pins for the declared live stream-stream join and the
declared live arbitrary-stateful run (plans/streaming_live.py).

Each TRUE streaming execution (real micro-batch engine, StateStore,
availableNow drain) must produce exactly what the equivalent batch plan
produces on the same fixture -- the rows-only declared queries carry
these pins in place of a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.plans.streaming_live import (
    stream_live_join,
    stream_live_stateful,
)
from hive_person_service_spark.sources import load_table

from conftest import SF_SMALL


def test_stream_live_join_equals_batch(spark):
    drained = stream_live_join(spark, SF_SMALL).collect()

    ev = load_table(spark, SF_SMALL, "events")
    v = ev.where(F.col("event_type") == "view").alias("v")
    p = load_table(spark, SF_SMALL, "events").where(
        F.col("event_type") == "purchase"
    ).alias("p")
    batch = (
        v.join(
            p,
            F.expr(
                "v.user_id = p.user_id AND p.ts > v.ts "
                "AND p.ts <= v.ts + INTERVAL 240 MINUTES"
            ),
        )
        .select(
            F.col("v.event_id").alias("a_id"),
            F.col("p.event_id").alias("b_id"),
            F.col("v.user_id").alias("user_id"),
        )
        .orderBy("a_id", "b_id")
        .collect()
    )
    assert len(drained) > 0, "fixture must produce at least one attribution pair"
    assert [tuple(r) for r in drained] == [tuple(r) for r in batch]


def test_stream_live_stateful_equals_batch(spark):
    drained = stream_live_stateful(spark, SF_SMALL).collect()

    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert len(drained) == len(batch) > 0
    for d, b in zip(drained, batch):
        assert d.user_id == b.user_id
        assert d.n_events == b.n_events
        # State accumulates in a single per-key pandas sum; batch sum order
        # may differ in the last ulp -- the round(4) in both sides absorbs it.
        assert abs(d.total_value - b.total_value) < 1e-9
