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


def test_stream_stream_join_state_bounded_by_watermark(spark, tmp_path):
    """The 10-minute watermark must EVICT buffered join state as event
    time advances: across a 6-batch feed spanning 2.5 hours, the state
    rows reported by StreamingQueryProgress.stateOperators must shrink
    from their peak instead of accumulating the whole history -- the
    bound that makes the operator runnable forever."""
    import datetime as dt
    import json
    import os
    import tempfile
    import time

    from hive_person_service_spark.streaming.jobs import stream_stream_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "feed")
    os.makedirs(src)
    schema = "event_id string, user_id long, event_type string, ts timestamp"
    for b in range(6):
        rows = []
        for u in range(20):
            t0 = base + dt.timedelta(minutes=30 * b)
            rows.append((f"v{b}_{u}", u, "view", t0))
            rows.append(
                (f"p{b}_{u}", u, "purchase", t0 + dt.timedelta(minutes=2))
            )
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{b}"
        )
        # file-source batch order follows modification time
        now = time.time() + b
        for root, _d, names in os.walk(f"{src}/b{b}"):
            for n in names:
                os.utime(os.path.join(root, n), (now, now))

    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    joined = stream_stream_join(
        feed.where(F.col("event_type") == "view"),
        feed.where(F.col("event_type") == "purchase"),
        window_minutes=5,
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_wm_")
    q = (
        joined.writeStream.format("memory")
        .queryName("wm_bound")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    progress = [json.loads(p.json) for p in q.recentProgress]
    states = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in progress
        if p.get("stateOperators")
    ]
    assert len(states) >= 4, f"expected multi-batch drain, got {states}"
    total_rows = 6 * 40
    # eviction observed: the final batch's retained state is below the
    # peak AND far below the full history
    assert states[-1] < max(states), states
    assert states[-1] < total_rows // 2, states
    # and the join itself was correct: one pair per (batch, user)
    got = spark.table("wm_bound").collect()
    assert len(got) == 6 * 20
