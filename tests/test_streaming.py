"""Structured Streaming smoke + batch-equivalence (SURVEY.md §5.2.4): each
streaming job over the events parquet with trigger(availableNow=True) must
equal its batch event-time form."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark import plans
from hive_person_service_spark.sources import load_table
from hive_person_service_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    stream_dedup_within_watermark,
    stream_session_agg,
    stream_static_enrich,
    stream_stream_join,
    stream_tumbling_agg,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMALL)
    got = run_to_memory_sink(stream_tumbling_agg(stream), spark, "complete")
    want = plans.all_queries()["stream_tumbling"](spark, SF_SMALL)
    cols = ["ws", "we", "event_type", "n", "total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMALL)
    got = run_to_memory_sink(stream_session_agg(stream), spark, "complete")
    want = plans.all_queries()["stream_session"](spark, SF_SMALL)
    cols = ["user_id", "session_start", "session_end", "n_events", "total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_smoke(spark):
    stream = read_events_stream(spark, SF_SMALL)
    got = run_to_memory_sink(stream_dedup_within_watermark(stream), spark)
    # one row per (user, type) seen; arrival order within a micro-batch is
    # not the deterministic batch order, so check keys not chosen rows
    batch = plans.all_queries()["stream_dedup_events"](spark, SF_SMALL)
    got_keys = {(r.user_id, r.event_type) for r in got.collect()}
    want_keys = {(r.user_id, r.event_type) for r in batch.collect()}
    assert got_keys == want_keys


def test_stream_static_join_smoke(spark):
    stream = read_events_stream(spark, SF_SMALL)
    dim = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )
    got = run_to_memory_sink(stream_static_enrich(stream, dim, "user_id"), spark)
    assert got.count() == load_table(spark, SF_SMALL, "events").count()
    assert got.where(F.col("user_total").isNull()).count() == 0


def test_parquet_streaming_sink_with_checkpoint(spark, tmp_path):
    """Durable sink: writeStream -> parquet + checkpointLocation; restart
    with the same checkpoint must not duplicate data (exactly-once files)."""
    stream = read_events_stream(spark, SF_SMALL)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    total = load_table(spark, SF_SMALL, "events").count()
    assert spark.read.parquet(out).count() == total
    run_once()  # same checkpoint: no new input -> no duplicates
    assert spark.read.parquet(out).count() == total


def test_approx_percentile_bounded_error(spark):
    got = {
        r.l_returnflag: r.p50_approx
        for r in plans.all_queries()["agg_percentile_approx"](
            spark, SF_SMALL
        ).collect()
    }
    exact = {
        r.l_returnflag: r.p50
        for r in plans.all_queries()["agg_percentile"](spark, SF_SMALL).collect()
    }
    for k, v in exact.items():
        assert abs(got[k] - v) <= 2.0, (k, got[k], v)  # qty domain 1..50


def test_stream_stream_join_equals_batch_range_join(spark):
    views = read_events_stream(spark, SF_SMALL).where(F.col("event_type") == "view")
    purchases = read_events_stream(spark, SF_SMALL).where(
        F.col("event_type") == "purchase"
    )
    got = run_to_memory_sink(stream_stream_join(views, purchases), spark)
    want = plans.all_queries()["join_range"](spark, SF_SMALL)
    cols = ["a_id", "b_id", "user_id"]
    assert _rows(got, cols) == _rows(want, cols)


def test_kafka_envelope_roundtrip_batch_and_stream(spark, tmp_path):
    """Kafka adapters: encode events into the connector's record shape,
    parse back -> identical typed rows. The parse transform is then run as
    an actual stream over an enveloped archive (the no-broker path)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hive_person_service_spark.streaming.kafka import (
        KAFKA_ENVELOPE,
        parse_kafka_json,
        to_kafka_json,
    )

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    payload_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    envel = to_kafka_json(ev, key_col="user_id", topic="events").select(
        "key",
        "value",
        "topic",
        F.lit(0).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )

    parsed = parse_kafka_json(envel, payload_schema)
    cols = ["event_id", "user_id", "event_type", "value"]
    assert _rows(parsed, cols) == _rows(ev, cols)
    assert parsed.where(F.col("kafka_key") != F.col("user_id").cast("string")).count() == 0

    archive = str(tmp_path / "kafka_archive")
    envel.write.parquet(archive)
    stream = spark.readStream.schema(KAFKA_ENVELOPE).parquet(archive)
    got = run_to_memory_sink(parse_kafka_json(stream, payload_schema), spark)
    assert _rows(got, cols) == _rows(ev, cols)


def test_stream_live_tumbling_matches_batch(spark):
    """The declared TRUE-streaming tumbling entry must equal the
    oracle-checked batch form row-for-row (modulo its string formatting)."""
    from pyspark.sql import functions as F

    from hive_person_service_spark import plans

    qs = plans.all_queries()
    live = {
        (r.ws, r.we, r.event_type, r.n, r.total)
        for r in qs["stream_live_tumbling"](spark, SF_SMALL).collect()
    }
    batch = {
        (
            r.ws.strftime("%Y-%m-%d %H:%M"),
            r.we.strftime("%Y-%m-%d %H:%M"),
            r.event_type,
            r.n,
            r.total,
        )
        for r in qs["stream_tumbling"](spark, SF_SMALL).collect()
    }
    assert live == batch


def test_python_datasource_rows(spark):
    """Custom Python DataSource: partition planning and per-partition
    generation produce exactly the declared deterministic relation."""
    from hive_person_service_spark.sources.pyds import (
        MOD,
        MULT,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("parts", "3")
        .option("rows_per_part", "40")
        .load()
    )
    rows = sorted((r.id, r.part, r.val) for r in df.collect())
    want = sorted(
        (p * 40 + i, p, ((p * 40 + i) * MULT) % MOD / 100.0)
        for p in range(3)
        for i in range(40)
    )
    assert rows == want


def test_stream_dedup_ingest_equals_batch_twin(spark):
    """The foreachBatch streaming ingest dedup finds EXACTLY the pairs the
    batch run of near_duplicates_incremental finds on the same
    corpus/new split (micro-batching must not change the answer)."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.operators.dedup import (
        doc_shingles,
        near_duplicates_incremental,
    )
    from hive_person_service_spark.sources import load_table
    from hive_person_service_spark.streaming.jobs import stream_incremental_dedup

    sf = "/root/testdata/sf0.001"
    streamed = {
        (r.id_a, r.id_b, r.jaccard)
        for r in stream_incremental_dedup(spark, sf, threshold=0.5).collect()
    }
    docs = load_table(spark, sf, "documents")
    corpus_sh = doc_shingles(docs.where(F.col("doc_id") % 2 == 0), n=3)
    batch = {
        (r.id_a, r.id_b, r.jaccard)
        for r in near_duplicates_incremental(
            docs.where(F.col("doc_id") % 2 == 1), corpus_sh, threshold=0.5
        ).collect()
    }
    assert streamed == batch


def test_stream_python_datasource_equals_batch(spark):
    """The Spark 4 Python streaming DataSource (SimpleDataSourceStreamReader)
    drains the same deterministic relation the batch reader scans: the
    per-part aggregate of the drained stream equals the oracle-checked
    batch query's output exactly."""
    from hive_person_service_spark.plans.streaming_live import (
        stream_python_datasource,
    )
    from hive_person_service_spark.plans.streaming_live import (
        source_python_datasource,
    )

    sf = "/root/testdata/sf0.001"
    streamed = {
        (r.part, r.n, r.total_val, r.first_id, r.last_id)
        for r in stream_python_datasource(spark, sf).collect()
    }
    batch = {
        (r.part, r.n, r.total_val, r.first_id, r.last_id)
        for r in source_python_datasource(spark, sf).collect()
    }
    assert streamed == batch
    assert len(streamed) == 8


def test_stream_dedup_ingest_crash_resume(spark, tmp_path):
    """Exactly-once through the crash-replay window (VERDICT r3 item 6):
    kill the ingest-dedup drain INSIDE a micro-batch -- after its pairs
    hit the sink, before its offset commits (the at-least-once danger
    zone) -- resume from the same checkpoint, and require the final pair
    set to be IDENTICAL to an uninterrupted run: the replayed batch must
    overwrite, not duplicate, and the remaining backlog must still
    drain."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hive_person_service_spark.operators.dedup import doc_shingles
    from hive_person_service_spark.sources import load_table
    from hive_person_service_spark.streaming.jobs import (
        ingest_dedup_drain,
        read_ingest_dedup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    corpus_sh = doc_shingles(docs.where(F.col("doc_id") % 2 == 0), n=3).persist()
    corpus_sh.count()
    new = docs.where(F.col("doc_id") % 2 == 1)

    land = str(tmp_path / "land")
    new.repartition(4).write.mode("overwrite").parquet(land)

    # uninterrupted reference run
    out_ref, ckpt_ref = str(tmp_path / "out_ref"), str(tmp_path / "ckpt_ref")
    ingest_dedup_drain(
        spark, corpus_sh, new.schema, land, out_ref, ckpt_ref, threshold=0.5
    )
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in read_ingest_dedup_pairs(spark, out_ref).collect()
    }

    # crashed-and-resumed run against the SAME out/ckpt
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises((StreamingQueryException, Exception)) as ei:
        ingest_dedup_drain(
            spark, corpus_sh, new.schema, land, out, ckpt,
            threshold=0.5, fail_at_batch=1,
        )
    assert "injected crash" in str(ei.value)
    ingest_dedup_drain(  # resume: batch 1 replays (overwrite), 2..3 drain
        spark, corpus_sh, new.schema, land, out, ckpt, threshold=0.5
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in read_ingest_dedup_pairs(spark, out).collect()
    }
    corpus_sh.unpersist()
    assert got == want and want


def test_kafka_envelope_stream_equals_batch(spark):
    """The Kafka-shaped streaming path end-to-end (minus only the
    connector jar): micro-batched envelope stream -> parse_kafka_json ->
    drained sink must equal the batch scan of the same synthetic topic --
    per-partition offsets and payload decode survive micro-batching."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from hive_person_service_spark.sources.pyds import (
        register_kafka_envelope_source,
    )
    from hive_person_service_spark.streaming.jobs import run_stream_until_idle
    from hive_person_service_spark.streaming.kafka import parse_kafka_json

    register_kafka_envelope_source(spark)
    payload = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    opts = {"topic_partitions": "2", "offsets_per_partition": "120",
            "offsets_per_batch": "40"}

    stream = spark.readStream.format("kafka_envelope_synthetic")
    for k, v in opts.items():
        stream = stream.option(k, v)
    got_df = run_stream_until_idle(
        parse_kafka_json(stream.load(), payload), spark
    )
    got = sorted(
        (r.event_id, r.user_id, r.value, r.partition, r.offset)
        for r in got_df.collect()
    )

    batch = spark.read.format("kafka_envelope_synthetic")
    for k, v in opts.items():
        batch = batch.option(k, v)
    want = sorted(
        (r.event_id, r.user_id, r.value, r.partition, r.offset)
        for r in parse_kafka_json(batch.load(), payload).collect()
    )
    assert got == want and len(want) == 240


def test_stream_live_sliding_matches_batch(spark):
    """The declared TRUE-streaming sliding entry must equal the
    oracle-checked batch form row-for-row (modulo string formatting)."""
    from hive_person_service_spark import plans

    qs = plans.all_queries()
    live = {
        (r.ws, r.event_type, r.n, r.total)
        for r in qs["stream_live_sliding"](spark, SF_SMALL).collect()
    }
    batch = {
        (r.ws.strftime("%Y-%m-%d %H:%M"), r.event_type, r.n, r.total)
        for r in qs["stream_sliding"](spark, SF_SMALL).collect()
    }
    assert live == batch


def test_stream_live_session_matches_batch(spark):
    """The declared TRUE-streaming session entry (StateStore session-merge
    path) must equal the oracle-checked batch twin."""
    from hive_person_service_spark import plans

    qs = plans.all_queries()
    live = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total)
        for r in qs["stream_live_session"](spark, SF_SMALL).collect()
    }
    batch = {
        (
            r.user_id,
            r.session_start.strftime("%Y-%m-%d %H:%M:%S"),
            r.session_end.strftime("%Y-%m-%d %H:%M:%S"),
            r.n_events,
            r.total,
        )
        for r in qs["stream_session"](spark, SF_SMALL).collect()
    }
    assert live == batch
