"""Kafka-shaped source/sink adapters (SURVEY.md §2.A streaming source row;
the message-bus ingest a production deployment of this engine would use).

The environment has no Kafka broker or spark-sql-kafka connector jar, so
the adapters split into:

  * envelope parsing/formatting -- pure DataFrame transforms over the FIXED
    Kafka record shape (key/value binary + topic/partition/offset/timestamp).
    Source-agnostic: the same function serves a real Kafka readStream, a
    batch read of archived Kafka dumps, or the synthetic test frames in
    tests/test_streaming.py. Fully tested here.
  * stream construction -- builds the ``format("kafka")`` reader/writer;
    raises a clear error if the connector jar is absent (env-gated, same
    policy as streaming/stateful_v2.py's protobuf gate).

Scale: one Spark partition per Kafka topic-partition; ``maxOffsetsPerTrigger``
bounds micro-batch size; keys carry through so a keyed sink preserves
per-key ordering within a topic-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The record shape every Kafka source yields (Spark's kafka connector
#: contract; also the shape to use for parquet archives of Kafka topics).
KAFKA_ENVELOPE = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def parse_kafka_json(
    enveloped: DataFrame,
    payload_schema: StructType,
    keep_metadata: bool = True,
) -> DataFrame:
    """Decode JSON message values into typed columns.

    Works identically on streaming and batch frames with the KAFKA_ENVELOPE
    shape. Payload fields become top-level columns; Kafka metadata rides
    along (needed for dedup-by-offset and per-partition ordering) unless
    ``keep_metadata=False``.
    """
    parsed = enveloped.withColumn(
        "__payload", F.from_json(F.col("value").cast("string"), payload_schema)
    )
    payload_cols = [F.col(f"__payload.{f.name}").alias(f.name) for f in payload_schema]
    meta_cols = (
        [F.col("key").cast("string").alias("kafka_key"), "topic", "partition", "offset"]
        if keep_metadata
        else []
    )
    return parsed.select(*payload_cols, *meta_cols)


def to_kafka_json(
    df: DataFrame, key_col: str, topic: str
) -> DataFrame:
    """Encode rows for a Kafka sink: (key, value, topic) with the full row
    JSON-serialized into ``value``. Inverse of parse_kafka_json for
    round-trip tests."""
    return df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def _require_kafka_connector(spark: SparkSession) -> None:
    jvm = spark._jvm
    try:
        jvm.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
    except Exception as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from exc


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a Kafka topic, KAFKA_ENVELOPE-shaped output.
    Env-gated: raises if the connector jar is absent."""
    _require_kafka_connector(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
):
    """Streaming sink to Kafka (df must carry key/value[/topic] columns,
    e.g. from to_kafka_json). Returns the started StreamingQuery."""
    _require_kafka_connector(df.sparkSession)
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
