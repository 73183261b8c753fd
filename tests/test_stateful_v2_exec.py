"""transformWithStateInPandas EXECUTION pins (SURVEY.md §2.I arbitrary
stateful, v2 API): typed state variables driven end-to-end through the
JVM state server over the vendored protobuf wire shim, on the RocksDB
state store.

What each test pins:
  * cross-batch state: maxFilesPerTrigger=1 forces one micro-batch per
    file; totals must ACCUMULATE across batches (state survives batch
    boundaries, not just within one handleInputRows call);
  * checkpoint resume: a second availableNow run over the same checkpoint
    with new files must fold ONLY the new rows into existing state (no
    double counting -- the exactly-once property the checkpoint carries);
  * ListState and MapState protocol surfaces against the batch oracle.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.sources import load_table
from hive_person_service_spark.streaming.stateful_v2 import (
    event_time_flush_v2,
    event_type_counts_v2,
    recent_values_totals_v2,
    rocksdb_state_provider,
    running_user_totals_v2,
    seeded_totals_v2,
    timed_counts_v2,
)

pytestmark = pytest.mark.usefixtures("spark")


def _drain(spark, stream_df, ckpt: str, name: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in 180s"


def _final_totals(spark, name: str) -> dict:
    out = spark.table(name)
    rows = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
        .select("user_id", "m.n_events", "m.total_value")
        .collect()
    )
    return {r.user_id: (r.n_events, round(r.total_value, 4)) for r in rows}


def _batch_totals(df) -> dict:
    rows = (
        df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("t"))
        .collect()
    )
    return {r.user_id: (r.n, r.t) for r in rows}


def test_value_state_accumulates_across_micro_batches(spark):
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    src = tempfile.mkdtemp(prefix="tws_src_")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    half_a = events.where(F.col("user_id") % 2 == 0)
    half_b = events.where(F.col("user_id") % 2 == 1)
    half_a.coalesce(1).write.mode("overwrite").parquet(src + "/f=a")
    half_b.coalesce(1).write.mode("append").parquet(src + "/f=b")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    name = "tws_exec_mb"
    with rocksdb_state_provider(spark):
        _drain(spark, running_user_totals_v2(stream), tempfile.mkdtemp(), name)
    # progress: >1 micro-batch actually ran
    assert (
        spark.table(name).count()
        > spark.table(name).select("user_id").distinct().count() - 1
    )
    assert _final_totals(spark, name) == _batch_totals(events)


def test_value_state_resumes_from_checkpoint_exactly_once(spark):
    """Same checkpoint, second run over new files: state must fold ONLY the
    new rows (memory sink can't recover checkpoints, so the restartable run
    lands update rows in parquet via foreachBatch — the durable-sink shape)."""
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    src = tempfile.mkdtemp(prefix="tws_resume_")
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    out = tempfile.mkdtemp(prefix="tws_out_")
    a = events.limit(400)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    stream_schema = events.schema

    def run():
        stream = spark.readStream.schema(stream_schema).parquet(src)
        with rocksdb_state_provider(spark):
            q = (
                running_user_totals_v2(stream)
                .writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda bdf, bid: bdf.write.mode("append").parquet(out)
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not drain in 180s"

    def finals():
        df = spark.read.parquet(out)
        rows = (
            df.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
            .select("user_id", "m.n_events", "m.total_value")
            .collect()
        )
        return {
            r.user_id: (r.n_events, round(r.total_value, 4)) for r in rows
        }

    run()
    assert finals() == _batch_totals(a)
    # append the remaining rows as a new file; SAME checkpoint -> the
    # restarted query must fold only the new file into existing state
    events.exceptAll(a).coalesce(1).write.mode("append").parquet(src)
    run()
    assert finals() == _batch_totals(events)


def test_list_state_totals_match_batch(spark):
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    src = tempfile.mkdtemp(prefix="tws_list_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "tws_exec_list"
    with rocksdb_state_provider(spark):
        _drain(spark, recent_values_totals_v2(stream), tempfile.mkdtemp(), name)
    assert _final_totals(spark, name) == _batch_totals(events)


def test_map_state_counts_match_batch(spark):
    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_type"
    )
    src = tempfile.mkdtemp(prefix="tws_map_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "tws_exec_map"
    with rocksdb_state_provider(spark):
        _drain(spark, event_type_counts_v2(stream), tempfile.mkdtemp(), name)
    got = {
        (r.user_id, r.event_type): r.n
        for r in spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    want = {
        (r.user_id, r.event_type): r.n
        for r in events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_processing_time_timers_fire_across_batches(spark):
    """Timer protocol end-to-end: batch 0 processes the input and every
    key re-arms a near-immediate timer (listTimers -> deleteTimer ->
    registerTimer); subsequent (empty) micro-batches run at strictly later
    processing times, so every key's timer must FIRE and emit its
    kind='timer' flush row carrying the state at expiry (the
    inactivity-flush shape). Processing-time mode keeps scheduling
    batches while timers are live (Spark's shouldRunAnotherBatch is
    conservatively true), so the query runs on a live trigger and is
    stopped explicitly once every timer has fired — availableNow would
    never terminate here by design."""
    import time

    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    src = tempfile.mkdtemp(prefix="tws_timer_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    a_keys = {r.user_id for r in events.select("user_id").distinct().collect()}
    assert a_keys, "fixture produced no keys"
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "tws_exec_timer"
    with rocksdb_state_provider(spark):
        q = (
            timed_counts_v2(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp())
            .start()
        )
        try:
            deadline = time.time() + 150
            fired: set = set()
            while time.time() < deadline and not a_keys <= fired:
                fired = {
                    r.user_id
                    for r in spark.table(name)
                    .where(F.col("kind") == "timer")
                    .select("user_id")
                    .distinct()
                    .collect()
                }
                time.sleep(1)
        finally:
            q.stop()
    missing = a_keys - fired
    assert not missing, f"timers never fired for {sorted(missing)[:5]}"
    # the flush row carries the state at expiry: all input landed in batch
    # 0, so the fired count equals the key's full count
    got = {
        r.user_id: r.n
        for r in spark.table(name)
        .where(F.col("kind") == "timer")
        .groupBy("user_id")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    want = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_initial_state_seeds_value_state(spark):
    """handleInitialState: totals seeded from a prior relation, stream
    folds only the live half — finals must equal the FULL batch aggregate
    (seed + stream), proving the seed landed in state before batch 1."""
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    # ROW-wise split: every key appears in BOTH the seed and the live
    # stream, so the final total per key proves seed + stream composed
    seed_rows = events.limit(400).cache()
    live = events.exceptAll(seed_rows)
    initial = seed_rows.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    src = tempfile.mkdtemp(prefix="tws_seed_")
    live.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "tws_exec_seed"
    with rocksdb_state_provider(spark):
        _drain(
            spark,
            seeded_totals_v2(stream, initial),
            tempfile.mkdtemp(),
            name,
        )
    got = _final_totals(spark, name)
    want = _batch_totals(events)  # = seed + live, per key
    # keys whose rows ALL landed in the seed emit no update row; every key
    # with at least one live row must carry seed+live totals
    live_keys = {r.user_id for r in live.select("user_id").distinct().collect()}
    assert set(got) == live_keys
    for uid in live_keys:
        assert got[uid] == want[uid], (uid, got[uid], want[uid])
    # and at least one checked key must genuinely have been seeded
    seeded_keys = {r.user_id for r in initial.select("user_id").collect()}
    assert live_keys & seeded_keys, "split produced no seeded+streamed key"


def test_event_time_timers_fire_when_watermark_passes(spark):
    """EVENT-time timers: run 1 (early-half timestamps) arms timers just
    past its watermark; run 2 (late-half timestamps, same checkpoint)
    advances the WATERMARK past them, so every run-1 key must flush —
    driven by event time in the data, not wall clock."""
    batch = load_table(spark, SF_SMALL, "events")
    ts_sorted = [r.ts for r in batch.select("ts").orderBy("ts").collect()]
    median = ts_sorted[len(ts_sorted) // 2]
    src = tempfile.mkdtemp(prefix="tws_evt_")
    ckpt = tempfile.mkdtemp(prefix="tws_evt_ckpt_")
    out = tempfile.mkdtemp(prefix="tws_evt_out_")
    stream_schema = None

    def run(df_filter):
        nonlocal stream_schema
        ev = load_table(spark, SF_SMALL, "events").where(df_filter).select(
            "ts", "user_id", "value"
        )
        ev.coalesce(1).write.mode("append").parquet(src)
        stream_schema = ev.schema
        stream = spark.readStream.schema(stream_schema).parquet(src)
        with rocksdb_state_provider(spark):
            q = (
                event_time_flush_v2(stream)
                .writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda bdf, bid: bdf.write.mode("append").parquet(out)
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not drain in 180s"

    early = F.col("ts") <= F.lit(median)
    run(early)
    run(~early)
    res = spark.read.parquet(out)
    fired = {
        r.user_id
        for r in res.where(F.col("kind") == "timer")
        .select("user_id")
        .distinct()
        .collect()
    }
    early_keys = {
        r.user_id
        for r in load_table(spark, SF_SMALL, "events")
        .where(early)
        .select("user_id")
        .distinct()
        .collect()
    }
    assert early_keys, "median split produced no early keys"
    missing = early_keys - fired
    assert not missing, f"event-time timers never fired for {sorted(missing)[:5]}"


def test_sessionize_out_of_order_merge(spark):
    """SessionizeProcessor: an early event arriving in a LATER micro-batch
    must merge two sessions that looked separate after batch 1 -- the
    full-buffer recompute handles what incremental merge logic breaks.
    Timeline (minutes): batch 1 delivers t=0 and t=50 (gap 50 > 30 ->
    two sessions); batch 2 delivers t=25 (bridges: max gap 25 <= 30 ->
    ONE session of 3 events)."""
    import os
    import tempfile

    from hive_person_service_spark.streaming.stateful_v2 import sessionize_v2

    minute = 60 * 1_000_000
    src = tempfile.mkdtemp(prefix="tws_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="tws_sess_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="tws_sess_out_")

    def run(batch_rows):
        df = spark.createDataFrame(batch_rows, "user_id long, tsu long")
        df.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, tsu long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with rocksdb_state_provider(spark):
            q = (
                sessionize_v2(stream)
                .writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda bdf, bid: bdf.write.mode("append").parquet(out_dir)
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not drain in 180s"

    run([(1, 0 * minute), (1, 50 * minute)])
    run([(1, 25 * minute)])
    res = spark.read.parquet(out_dir)
    final = res.where(
        F.col("n_total")
        == res.agg(F.max("n_total")).collect()[0][0]
    ).collect()
    assert len(final) == 1
    r = final[0]
    assert (r.start_us, r.end_us, r.n_events, r.n_total) == (
        0, 50 * minute, 3, 3,
    )
    # and the batch-1 emission really did see two sessions (the merge
    # was observable, not vacuous)
    first = res.where(F.col("n_total") == 2).collect()
    assert sorted((x.start_us, x.end_us, x.n_events) for x in first) == [
        (0, 0, 1), (50 * minute, 50 * minute, 1),
    ]
