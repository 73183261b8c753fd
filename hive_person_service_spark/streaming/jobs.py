"""§2.I -- Structured Streaming forms of the event-time operators.

The declared (oracle-checked) forms in plans/events_stream.py are the batch
event-time equivalents; these are the same computations as streaming jobs:
``readStream`` source -> watermarked stateful transformation -> sink. Batch
== streaming equivalence is pinned by tests/test_streaming.py using
``trigger(availableNow=True)`` over the same parquet.

State/scale notes: watermarks bound the StateStore (late events beyond the
horizon are dropped and their state evicted); state lives per-partition on
executors and checkpoints to ``checkpointLocation``. At 100 TB/day ingest,
the same code runs with a Kafka source, RocksDB state store, and a
partitioned parquet sink -- only the ``format(...)`` lines change.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure
from ..sources.schemas import SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events parquet (append-only table model),
    with the same physical-ts handling as the batch loader (the fixture has
    shipped both TIMESTAMP(NANOS) and timestamp[us])."""
    import os

    from ..sources.loader import _events_ts_kind

    configure(spark)
    kind = _events_ts_kind(spark, os.path.join(sf_dir, "events.parquet"))
    # Glob, not the bare file path: FileStreamSource requires a directory
    # basePath (a single-file path fails with "basePath must be a directory").
    if kind == "nanos_long":
        raw = (
            spark.readStream.schema(SCHEMAS["events_raw"])
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{sf_dir}/events.*")
        )
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events.*")
    )


def stream_tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windowed counts/sums with a watermark bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "n",
            "total",
        )
    )


def stream_sliding_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding (1 hour / 15 min hop) windowed aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "total")
    )


def stream_session_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based (30 min) session windows per user -- stateful merge in the
    StateStore, sessions emitted once the watermark passes their end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


def stream_dedup_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stateful dedup on (user_id, event_type) keeping the first arrival
    within the watermark horizon -- state is evictable, unlike plain
    dropDuplicates whose state grows forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich the stream with a (broadcast) dimension --
    identical semantics to the batch broadcast join."""
    return events.join(F.broadcast(dim), on=on, how="left")


def stream_stream_join(
    views: DataFrame, purchases: DataFrame, window_minutes: int = 5
) -> DataFrame:
    """Stream-stream join with watermarks + time-range condition (the
    streaming form of join_range): purchases within window_minutes after a
    view. Buffered state on each side is bounded by the watermark horizon
    plus the range width."""
    v = views.withWatermark("ts", "10 minutes").alias("v")
    p = purchases.withWatermark("ts", "10 minutes").alias("p")
    return v.join(
        p,
        F.expr(
            f"""
            v.user_id = p.user_id AND
            p.ts > v.ts AND p.ts <= v.ts + INTERVAL {int(window_minutes)} MINUTES
            """
        ),
    ).select(
        F.col("v.event_id").alias("a_id"),
        F.col("p.event_id").alias("b_id"),
        F.col("v.user_id").alias("user_id"),
    )


def stream_scd2_profiles(
    spark: SparkSession, sf_dir: str, history_path: str
) -> None:
    """End-to-end incremental profile-dimension maintenance: the event
    stream is treated as a feed of profile-attribute updates (user_id ->
    value), and each micro-batch MERGEs into an SCD2 parquet history via
    foreachBatch + stage-then-swap (same atomicity story as
    maintenance.merge_upsert). Runs to completion with availableNow.

    Replay safety: a re-delivered batch re-applies updates whose tracked
    values equal the open row, and the merge's no-op collapse drops them --
    foreachBatch's at-least-once delivery composes with the merge into
    effectively-once history, provided batches arrive in event-time order
    (scd2_merge's in-order assumption; dropDuplicatesWithinWatermark
    upstream enforces per-key uniqueness within the horizon)."""
    import uuid as _uuid
    from pathlib import Path

    from ..operators.maintenance import _swap_in
    from ..operators.scd import scd2_merge

    updates = read_events_stream(spark, sf_dir).select(
        "user_id", F.col("value").alias("balance"), "ts"
    )

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        sess = batch.sparkSession
        target = Path(history_path)
        if target.exists():
            history = sess.read.parquet(str(target))
        else:
            history = (
                batch.limit(0)
                .select(
                    "user_id",
                    "balance",
                    F.col("ts").alias("effective_from"),
                    F.col("ts").alias("effective_to"),
                    F.lit(True).alias("is_current"),
                )
            )
        merged = scd2_merge(history, batch, ["user_id"], ["balance"], "ts")
        staging = target.with_name(
            target.name + f".staging-{_uuid.uuid4().hex[:8]}"
        )
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, target)

    ckpt = tempfile.mkdtemp(prefix="ckpt_scd2_")
    q = (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("stream_scd2_profiles did not drain within 180s")


def drain_budget_secs(sf_dir: str, floor_secs: int = 120) -> int:
    """Scale-derived drain budget for availableNow verification runs:
    grows with the events fixture's byte size (~1 extra second per
    100 KB -- calibrated so sf0.1 stays at the floor and sf1's
    stream-stream join gets the minutes it legitimately needs on a
    loaded box), capped at 900 s so a wedged stream still fails fast.
    The SPARK_GRAFT_STREAM_DRAIN_SECS env override (run_to_memory_sink)
    still wins when set -- the ops escape hatch, no longer the only
    source of a big-SF budget."""
    try:
        size = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        return floor_secs
    return max(floor_secs, min(900, 60 + size // 100_000))


def run_to_memory_sink(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "append",
    drain_secs: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion with
    trigger(availableNow=True) into a memory sink; return the result as a
    batch DataFrame. Pass output_mode='complete' for streaming aggregations
    (in append mode a window only emits after the watermark passes it, so a
    bounded replay would drop the tail windows). Test/verification harness --
    production sinks are parquet/Kafka with checkpointLocation on durable
    storage."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # scale-aware drain budget: callers pass a scale-derived budget
    # (drain_budget_secs); the env knob remains the explicit override so
    # big-SF verification runs can distinguish "slow" from "wedged"
    env = os.environ.get("SPARK_GRAFT_STREAM_DRAIN_SECS")
    secs = int(env) if env else (drain_secs if drain_secs else 120)
    if not q.awaitTermination(secs):
        q.stop()
        raise TimeoutError(f"run_to_memory_sink did not drain within {secs}s")
    return spark.table(name)


def stream_cms_maintenance(
    spark: SparkSession, sf_dir: str, sketch_path: str
) -> None:
    """Incrementally maintain a persisted count-min sketch over the event
    stream (frequency of event_type): each micro-batch builds its own tiny
    sketch (operators/sketches.cms_build -- one grouped pass, <= d*w cells)
    and merges it into the parquet-persisted sketch by (seed, bucket) sum,
    stage-then-swap for atomicity. This is the streaming face of the
    "sketch as a mergeable artifact" design: the persisted state stays
    <= d*w rows forever, however much stream has flowed through.

    Replay guard: CMS addition is NOT idempotent, so at-least-once
    foreachBatch redelivery would double-count. A `_last_batch` column
    carried in the sketch rows records the high-water batch id; batches at
    or below it are skipped. The swap publishes counts and watermark
    atomically -- effectively-once without a transactional table."""
    import uuid as _uuid
    from pathlib import Path

    from ..operators.maintenance import _swap_in
    from ..operators.sketches import cms_build

    events = read_events_stream(spark, sf_dir).select("event_type")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        target = Path(sketch_path)
        if target.exists():
            current = sess.read.parquet(str(target))
            high = current.agg(F.max("_last_batch")).collect()[0][0]
            if high is not None and batch_id <= high:
                return  # replayed batch: already folded in
            current = current.select("seed", "bucket", "cnt")
        else:
            current = None
        delta = cms_build(batch, "event_type")
        merged = delta if current is None else (
            current.unionByName(delta)
            .groupBy("seed", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        merged = merged.withColumn("_last_batch", F.lit(batch_id))
        staging = target.with_name(
            target.name + f".staging-{_uuid.uuid4().hex[:8]}"
        )
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, target)

    ckpt = tempfile.mkdtemp(prefix="ckpt_cms_")
    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("stream_cms_maintenance did not drain within 180s")


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the documents parquet (append-only corpus
    model): new crawl batches land as files; maxFilesPerTrigger simulates
    incremental arrival."""
    configure(spark)
    return (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/documents.*")
    )


def stream_quality_gate(docs: DataFrame) -> DataFrame:
    """Streaming corpus-quality gate: apply the Gopher rule battery
    (plans/pipeline5.gopher_keep -- the SAME Column expression as the batch
    query, so batch and stream can never drift) to documents as they
    arrive. Stateless map/filter: no watermark, no state store; at scale
    this is the continuous admission filter in front of the training-data
    lake."""
    from ..plans.pipeline5 import gopher_keep

    return docs.where(gopher_keep()).select("doc_id", "lang", "source", "n_chars")


def stream_incremental_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.7,
    n_files: int = 2,
) -> DataFrame:
    """Continuous-ingest near-dup: stream NEW documents (landing-zone file
    source, one file per micro-batch) and check each micro-batch against a
    PERSISTED corpus shingle index via foreachBatch ->
    near_duplicates_incremental -- the corpus is never re-hashed; per-batch
    cost scales with the batch. Pairs append to a parquet sink; the drained
    result returns as a batch DataFrame.

    This is the production shape for training-corpus ingest dedup: the
    corpus side is a maintained staging table (here: even doc_ids,
    shingled once and persisted), the stream side is whatever the crawler
    lands. trigger(availableNow) drains the backlog exactly once;
    checkpointing makes re-runs idempotent per landing file. n_files=2
    keeps the run genuinely multi-batch (incremental state + idempotent
    per-batch sinks both exercised) at half the trigger/commit overhead
    of the earlier 4-file default -- the pair set is file-count-invariant
    (pytest pins it equal to the batch twin)."""
    import os

    from ..operators.dedup import doc_shingles, near_duplicates_incremental
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus_shingled = doc_shingles(
        docs.where(F.col("doc_id") % 2 == 0), n=3
    ).persist()
    corpus_shingled.count()

    import shutil

    land = tempfile.mkdtemp(prefix="dedup_land_")
    out = tempfile.mkdtemp(prefix="dedup_out_")
    ckpt = tempfile.mkdtemp(prefix="dedup_ckpt_")
    try:
        new = docs.where(F.col("doc_id") % 2 == 1)
        new.repartition(n_files).write.mode("overwrite").parquet(land)
        ingest_dedup_drain(
            spark, corpus_shingled, new.schema, land, out, ckpt,
            threshold=threshold,
        )
        result = read_ingest_dedup_pairs(spark, out)
        # Materialize off the temp sink (eager localCheckpoint: block-
        # manager-backed, executor-side) so the directories can be removed
        # in finally without breaking the returned lazy plan.
        return result.localCheckpoint(eager=True)
    finally:
        corpus_shingled.unpersist()
        for d in (land, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def ingest_dedup_drain(
    spark: SparkSession,
    corpus_shingled: DataFrame,
    schema,
    landing: str,
    out: str,
    ckpt: str,
    threshold: float = 0.7,
    fail_at_batch: int | None = None,
) -> None:
    """One availableNow drain of the ingest-dedup stream over an existing
    landing dir. The foreachBatch sink is IDEMPOTENT: each micro-batch
    OVERWRITES its own ``batch=<id>`` directory, so an at-least-once
    replay after a crash between sink write and checkpoint commit lands
    on the same path instead of appending duplicates -- that replay
    window is exactly what ``fail_at_batch`` injects (raise AFTER the
    batch's output is written, BEFORE its offset commits) and what
    tests/test_streaming.py::test_stream_dedup_ingest_crash_resume pins.
    """
    from ..operators.dedup import near_duplicates_incremental

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = near_duplicates_incremental(
            batch_df, corpus_shingled, threshold=threshold
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out, f"batch={batch_id}")
        )
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(
                f"injected crash in batch {batch_id} (post-sink, pre-commit)"
            )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow drains a FIXED backlog; a False return means the drain
    # did not finish -- the parquet sink would hold a silently partial
    # pair set, so fail loudly instead of returning it.
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("ingest_dedup_drain did not drain within 180s")


def read_ingest_dedup_pairs(spark: SparkSession, out: str) -> DataFrame:
    """Collect the pair set from the per-batch sink directories."""
    if not any(d.startswith("batch=") for d in os.listdir(out)):
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("id_a", LongType()),
                    StructField("id_b", LongType()),
                    StructField("jaccard", DoubleType()),
                ]
            ),
        )
    return spark.read.parquet(out).select("id_a", "id_b", "jaccard")


def run_stream_until_idle(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "append",
    timeout_s: int = 90,
) -> DataFrame:
    """Drain a streaming DataFrame whose source does NOT support
    Trigger.AvailableNow (e.g. Python SimpleDataSourceStreamReader, which
    falls back to ONE batch under availableNow): run with a tight
    processing-time trigger and stop once the query reports NO available
    data and NO active trigger after at least two completed batches --
    the source's prefetcher has confirmed the offset stopped advancing.
    That status flips as soon as the last data batch commits, which cuts
    the drain's tail by the ~10s the final EMPTY micro-batch used to
    take to schedule (measured 17.8s -> 6.8s for the 2-batch synthetic
    stream); the empty-batch observation remains as a fallback signal.
    Stability: the idle status must hold for 3 consecutive polls before
    stopping, so a between-batches lull can't truncate the drain.
    Returns the memory-sink relation as a batch DataFrame."""
    import time

    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + timeout_s
    drained = False
    idle_polls = 0
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["numInputRows"] == 0 and p["batchId"] > 0:
            drained = True  # fallback: an empty batch actually ran
            break
        st = q.status
        if (
            p is not None
            and p["batchId"] >= 1
            and not st["isDataAvailable"]
            and not st["isTriggerActive"]
        ):
            idle_polls += 1
            if idle_polls >= 3:
                drained = True
                break
        else:
            idle_polls = 0
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(30)
    if not drained:
        raise TimeoutError(f"stream did not go idle within {timeout_s}s")
    return spark.table(name)


def stream_into_delta(
    stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str = "delta-ingest",
    timeout_s: int = 120,
    crash_after_batch: int | None = None,
) -> None:
    """EXACTLY-ONCE streaming ingest into a Delta table via the
    protocol's ``txn`` action (sources/delta_log.py): each micro-batch
    commit embeds ``txn {appId, version=batch_id}``; on redelivery (crash
    between sink and Spark's own checkpoint commit, or a rebuilt
    checkpoint re-running from batch 0) the sink consults
    delta_txn_version and SKIPS batches already in the log -- the
    table-side idempotence every Delta streaming writer relies on, so
    at-least-once delivery composes to exactly-once.

    ``crash_after_batch`` injects a failure AFTER the delta commit of
    that batch but BEFORE Spark records the batch as complete -- the
    worst-case window (tests restart from the same checkpoint and must
    not double-ingest)."""
    from ..sources.delta_log import delta_txn_version, delta_write

    class _Injected(RuntimeError):
        pass

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        try:
            committed = delta_txn_version(table, app_id)
        except ValueError:
            committed = -1  # table not created yet
        if batch_id > committed:
            delta_write(batch_df, table, mode="append",
                        txn=(app_id, batch_id))
        if crash_after_batch is not None and batch_id == crash_after_batch:
            raise _Injected(f"injected crash after batch {batch_id}")

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"stream_into_delta: no drain in {timeout_s}s")
    except Exception as e:
        if "injected crash" not in str(e):
            raise


def stream_into_iceberg(
    stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str = "iceberg-ingest",
    timeout_s: int = 120,
    crash_after_batch: int | None = None,
) -> None:
    """EXACTLY-ONCE streaming ingest into an Iceberg table -- the twin of
    stream_into_delta, carried by snapshot summaries + the
    ``ingest.<app_id>`` table property (sources/iceberg.py::
    iceberg_txn_version): each micro-batch appends with
    ``txn=(app_id, batch_id)``; on redelivery (crash between the Iceberg
    commit and Spark's checkpoint, or a rebuilt checkpoint replaying from
    batch 0) the sink skips batches already committed. The property-based
    record survives expire_snapshots, so replay protection outlives
    snapshot retention.

    ``crash_after_batch`` injects a failure AFTER the Iceberg commit of
    that batch but BEFORE Spark records it -- the worst-case window."""
    from ..sources.iceberg import iceberg_txn_version, iceberg_write

    class _Injected(RuntimeError):
        pass

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        try:
            committed = iceberg_txn_version(table, app_id)
        except ValueError:
            committed = -1  # table not created yet
        if batch_id > committed:
            iceberg_write(batch_df, table, mode="append",
                          txn=(app_id, batch_id))
        if crash_after_batch is not None and batch_id == crash_after_batch:
            raise _Injected(f"injected crash after batch {batch_id}")

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"stream_into_iceberg: no drain in {timeout_s}s")
    except Exception as e:
        if "injected crash" not in str(e):
            raise


def stream_into_hive_acid(
    stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str = "acid-ingest",
    key_col: str | None = None,
    n_buckets: int = 2,
    timeout_s: int = 120,
    crash_after_batch: int | None = None,
) -> None:
    """EXACTLY-ONCE streaming ingest into an insert-only (MM) Hive ACID
    table: each micro-batch lands as one raw ``delta_N_N`` whose ingest
    marker (``_ingest_<app>_<batch>``) is published by the SAME atomic
    directory rename as the data, so on redelivery (crash between sink
    and Spark's checkpoint commit, or a rebuilt checkpoint replaying
    from batch 0) the sink consults hive_acid_txn_version and SKIPS
    batches already on disk -- the role Hive's metastore transaction
    registry plays for its streaming ingest, modeled table-side.

    ``crash_after_batch`` injects a failure AFTER the delta publish but
    BEFORE Spark records the batch -- the worst-case redelivery window."""
    from ..sources.hive_acid import (
        hive_acid_insert_only,
        hive_acid_txn_version,
    )

    class _Injected(RuntimeError):
        pass

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        try:
            committed = hive_acid_txn_version(table, app_id)
        except (ValueError, FileNotFoundError):
            committed = -1  # table not created yet
        if batch_id > committed:
            hive_acid_insert_only(
                batch_df.sparkSession, table, batch_df,
                key_col=key_col, n_buckets=n_buckets,
                ingest=(app_id, batch_id),
            )
        if crash_after_batch is not None and batch_id == crash_after_batch:
            raise _Injected(f"injected crash after batch {batch_id}")

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"stream_into_hive_acid: no drain in {timeout_s}s"
            )
    except Exception as e:
        if "injected crash" not in str(e):
            raise


def stream_into_hudi(
    stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    record_key: str,
    app_id: str = "hudi-ingest",
    table_type: str = "cow",
    n_buckets: int = 2,
    timeout_s: int = 120,
    crash_after_batch: int | None = None,
) -> None:
    """EXACTLY-ONCE streaming ingest into a Hudi table -- the fourth
    format's write side (Delta / Iceberg / Hive ACID MM already have
    one), carried by ingest markers in commit metadata
    (sources/hudi.py::hudi_txn_version, the deltastreamer-checkpoint
    slot): each micro-batch upserts with ``ingest=(app_id, batch_id)``;
    on redelivery (crash between the Hudi commit and Spark's checkpoint,
    or a rebuilt checkpoint replaying from batch 0) the sink skips
    batches already on the timeline.  Markers survive cleans and
    compactions because they ride timeline actions, not data files.

    ``crash_after_batch`` injects a failure AFTER the Hudi commit of
    that batch but BEFORE Spark records it -- the worst-case window."""
    from ..sources.hudi import hudi_txn_version, hudi_write

    class _Injected(RuntimeError):
        pass

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        try:
            committed = hudi_txn_version(table, app_id)
        except (ValueError, FileNotFoundError):
            committed = -1  # table not created yet
        if batch_id > committed:
            hudi_write(batch_df.sparkSession, table, batch_df,
                       record_key=record_key, table_type=table_type,
                       n_buckets=n_buckets, ingest=(app_id, batch_id))
        if crash_after_batch is not None and batch_id == crash_after_batch:
            raise _Injected(f"injected crash after batch {batch_id}")

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"stream_into_hudi: no drain in {timeout_s}s")
    except Exception as e:
        if "injected crash" not in str(e):
            raise
