"""Batch 17 — true-streaming declared entry + custom Python DataSource
(round 2):

- stream_live_tumbling: the §2.I tumbling aggregate run through the REAL
  Structured Streaming engine (readStream -> watermark -> window ->
  memory sink, trigger(availableNow)) rather than its batch equivalent --
  the declared surface now carries a genuinely streaming row. Rows-only
  (a streaming job is not one DuckDB query), but its batch twin
  (stream_tumbling) is oracle-checked and pytest pins them equal.
- source_python_datasource: a custom `pyspark.sql.datasource` source
  (sources/pyds.py) scanned and aggregated -- the §2.A extensibility
  path; deterministic-arithmetic rows keep it ORACLE-checkable via
  generate_series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pyds import MOD, MULT, register_synthetic_source
from .registry import declare


@declare("stream_live_tumbling", oracle=None)  # rows-only: true streaming
def stream_live_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums executed by the STREAMING
    engine end-to-end: file streaming source (maxFilesPerTrigger) ->
    watermark -> window aggregate -> memory sink, trigger(availableNow)
    draining the backlog exactly once. Output matches the oracle-checked
    batch form stream_tumbling (pinned in tests/test_streaming.py); this
    entry exists so the driver-certified surface includes the real
    streaming path, not just batch equivalents."""
    from ..streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        stream_tumbling_agg,
    )

    events = read_events_stream(spark, sf_dir)
    agg = stream_tumbling_agg(events)
    out = run_to_memory_sink(agg, spark, output_mode="complete")
    return out.select(
        F.date_format("ws", "yyyy-MM-dd HH:mm").alias("ws"),
        F.date_format("we", "yyyy-MM-dd HH:mm").alias("we"),
        "event_type",
        "n",
        "total",
    ).orderBy("ws", "event_type")


@declare(
    "source_python_datasource",
    oracle=f"""
    WITH rows_src AS (
      SELECT i AS id, CAST(i // 250 AS INTEGER) AS part,
             CAST((i * {MULT}) % {MOD} AS DOUBLE) / 100.0 AS val
      FROM (SELECT unnest(generate_series(0, 1999)) AS i))
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(val), 2) AS total_val,
           CAST(MIN(id) AS BIGINT) AS first_id,
           CAST(MAX(id) AS BIGINT) AS last_id
    FROM rows_src GROUP BY part
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a CUSTOM Python DataSource (Spark 4 datasource API,
    sources/pyds.py: schema + partition planning + per-partition row
    generator -- the extensibility contract for bespoke sources) and
    aggregate per source partition. The source emits deterministic
    arithmetic rows, so DuckDB re-derives the identical relation from
    generate_series and the whole custom-source scan stays
    oracle-checked."""
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("parts", "8")
        .option("rows_per_part", "250")
        .load()
    )
    return df.groupBy("part").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("val"), 2).alias("total_val"),
        F.min("id").cast("long").alias("first_id"),
        F.max("id").cast("long").alias("last_id"),
    )


@declare("stream_dedup_ingest", oracle=None)  # rows-only: true streaming
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest near-dup THROUGH the streaming engine: odd
    doc_ids land as files and stream in one-file micro-batches; each
    micro-batch is checked against the persisted even-doc_id corpus
    shingle index via foreachBatch -> near_duplicates_incremental (corpus
    never re-hashed, per-batch cost scales with the batch). Rows-only (a
    multi-batch streaming job is not one DuckDB query); pytest pins the
    drained pair set equal to the batch twin run of
    near_duplicates_incremental on the same split."""
    from ..streaming.jobs import stream_incremental_dedup

    return stream_incremental_dedup(spark, sf_dir, threshold=0.7).orderBy(
        "id_a", "id_b"
    )


@declare("stream_python_datasource", oracle=None)  # rows-only: streaming run
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING scan of the custom Python DataSource (Spark 4
    SimpleDataSourceStreamReader: initialOffset -> read(start) ->
    micro-batch rows + next offset), drained until the source goes idle
    (the Python micro-batch stream does not support availableNow -- it
    silently falls back to ONE batch, so the drain loop watches for the
    first empty progress instead) and aggregated per source partition.
    Rows-only (a multi-batch streaming run is not one DuckDB query), but
    the relation is the same deterministic arithmetic as
    source_python_datasource, so pytest pins the drained aggregate equal
    to that oracle-checked batch query."""
    from ..streaming.jobs import run_stream_until_idle

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_rows")
        .option("rows_per_batch", "1000")
        .option("max_rows", "2000")
        .load()
    )
    drained = run_stream_until_idle(stream, spark, output_mode="append")
    return (
        drained.groupBy("part")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("val"), 2).alias("total_val"),
            F.min("id").cast("long").alias("first_id"),
            F.max("id").cast("long").alias("last_id"),
        )
        .orderBy("part")
    )


@declare(
    "source_kafka_envelope",
    oracle=f"""
    WITH msgs AS (
      SELECT p, o,
             p * 1000000 + o AS event_id,
             (o * 13 + p * 7) % 50 AS user_id,
             CAST(((p * 1000000 + o) * {MULT}) % {MOD} AS DOUBLE) / 100.0
               AS value
      FROM (SELECT unnest(generate_series(0, 2)) AS p)
      CROSS JOIN (SELECT unnest(generate_series(0, 399)) AS o))
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(MIN(o) AS BIGINT) AS min_offset,
           CAST(MAX(o) AS BIGINT) AS max_offset,
           MIN(value) AS min_value
    FROM msgs GROUP BY user_id
    """,
)
def source_kafka_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka ingest path minus only the connector jar: scan a source
    that yields the EXACT Kafka record envelope (key/value binary +
    topic/partition/offset/timestamp -- sources/pyds.py, one Spark
    partition per topic-partition like the real connector), decode the
    JSON payloads with the production parse_kafka_json transform
    (streaming/kafka.py -- the same function a real format('kafka')
    stream feeds), and aggregate per user. The envelope rows are
    deterministic arithmetic, so DuckDB re-derives the identical relation
    and the whole envelope-decode path is oracle-checked;
    format('kafka') construction itself stays env-gated
    (_require_kafka_connector)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..sources.pyds import register_kafka_envelope_source
    from ..streaming.kafka import parse_kafka_json

    register_kafka_envelope_source(spark)
    env = (
        spark.read.format("kafka_envelope_synthetic")
        .option("topic_partitions", "3")
        .option("offsets_per_partition", "400")
        .load()
    )
    payload = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    parsed = parse_kafka_json(env, payload, keep_metadata=True)
    return parsed.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_msgs"),
        F.sum("event_id").cast("long").alias("sum_event_id"),
        F.min("offset").cast("long").alias("min_offset"),
        F.max("offset").cast("long").alias("max_offset"),
        F.min("value").alias("min_value"),
    )


@declare("stream_live_sliding", oracle=None)  # rows-only: true streaming
def stream_live_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1 hour / 15 min hop) aggregate executed by the
    STREAMING engine end-to-end (file source -> watermark -> overlapping
    windows -> memory sink, trigger(availableNow)). Completes the live
    coverage of the §2.I window family: every event lands in 4 windows'
    state simultaneously, the shape that actually stresses the
    StateStore. Pytest pins the drained output equal to the
    oracle-checked batch twin stream_sliding."""
    from ..streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        stream_sliding_agg,
    )

    events = read_events_stream(spark, sf_dir)
    agg = stream_sliding_agg(events)
    out = run_to_memory_sink(agg, spark, output_mode="complete")
    return out.select(
        F.date_format("ws", "yyyy-MM-dd HH:mm").alias("ws"),
        "event_type",
        "n",
        "total",
    ).orderBy("ws", "event_type")


@declare("stream_live_session", oracle=None)  # rows-only: true streaming
def stream_live_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min gap per user) executed by the
    STREAMING engine end-to-end -- the one §2.I window type whose state is
    MERGED (adjacent sessions collapse when a bridging event arrives),
    exercised through the real StateStore session-merge path rather than
    its batch rewrite. Pytest pins the drained output equal to the
    oracle-checked batch twin stream_session."""
    from ..streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        stream_session_agg,
    )

    events = read_events_stream(spark, sf_dir)
    agg = stream_session_agg(events)
    out = run_to_memory_sink(agg, spark, output_mode="complete")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "total",
    ).orderBy("user_id", "session_start")


@declare("stream_live_join", oracle=None)  # rows-only: true streaming
def stream_live_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-range join executed by the STREAMING engine
    end-to-end: the view stream joined to the purchase stream on user
    within (ts, ts + 5 min], both sides watermarked 10 minutes --
    the attribution join (which view led to this purchase) that
    previously lived only as a pytest smoke. Inner-join rows emit as
    soon as both sides arrive; the watermark bounds the buffered state
    on each side to the 10-minute horizon plus the 5-minute range, which
    is what makes the operator runnable forever at 100 TB/day: state is
    proportional to the time window (here widened to 4 h so the sparse
    small-SF fixture yields pairs), never the history. Drained with
    trigger(availableNow) into a memory sink; pytest pins the drained
    pairs equal to the identical batch join (tests/test_streaming_live_join.py)."""
    from ..streaming.jobs import (
        drain_budget_secs,
        read_events_stream,
        run_to_memory_sink,
        stream_stream_join,
    )

    events = read_events_stream(spark, sf_dir)
    views = events.where(F.col("event_type") == "view")
    purchases = events.where(F.col("event_type") == "purchase")
    joined = stream_stream_join(views, purchases, window_minutes=240)
    out = run_to_memory_sink(
        joined, spark, output_mode="append",
        drain_secs=drain_budget_secs(sf_dir),
    )
    return out.orderBy("a_id", "b_id")


@declare("stream_live_stateful", oracle=None)  # rows-only: true streaming
def stream_live_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key state via applyInPandasWithState executed by the
    STREAMING engine end-to-end (file source -> grouped state machine ->
    update-mode memory sink, availableNow): running per-user event/value
    totals, the custom-counter shape (fraud scores, quota meters) that
    windowed aggregation can't express. Each drained UPDATE row carries
    the key's running total at that micro-batch; the final state per key
    is recovered as the max-(n_events) update -- n_events strictly
    increases per key per batch, so the reduction is deterministic.
    Pytest pins the recovered final totals equal to the batch
    groupBy-sum (tests/test_streaming_live_join.py). State lives
    per-key in the checkpointed StateStore, partitioned across
    executors -- the 100 TB shape is one shuffle on user_id and O(keys)
    state, with RocksDB as the production store."""
    from ..streaming.jobs import read_events_stream, run_to_memory_sink
    from ..streaming.stateful import running_user_totals

    events = read_events_stream(spark, sf_dir)
    updates = running_user_totals(events)
    out = run_to_memory_sink(updates, spark, output_mode="update")
    final = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.round(F.col("m.total_value"), 4).alias("total_value"),
        )
    )
    return final.orderBy("user_id")
