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
