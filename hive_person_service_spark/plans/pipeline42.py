"""Round-4 continuation batch 42: streaming alerting, quarantined CSV
ingest, column-level encryption.

- stream_live_alert_rules: the batch-41 rules engine run by the
  STREAMING engine — hourly metrics aggregate over the event stream,
  each micro-batch's metrics join the broadcast rules relation inside
  foreachBatch (the production pattern for post-aggregation logic), and
  fired alerts land in the sink. Rows-only; pytest pins the drained
  result to the batch twin.
- source_csv_quarantine: PERMISSIVE landing-zone ingest DECLARED — a
  corrupted CSV layout (clean export + a known bad part-file) reads
  back with malformed rows quarantined, clean rows typed; the oracle
  re-derives both populations, proving the router drops nothing and
  quarantines exactly the breakage.
- fn_aes_roundtrip: column-level AES encryption (aes_encrypt/decrypt,
  ECB for determinism) — the governance surface for encrypting PII
  columns at rest inside the table; rows-only (DuckDB has no AES) with
  the roundtrip identity pinned in-result and in pytest.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline41 import _ALERT_RULES
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def _hourly_alert_rules(spark: SparkSession):
    """The rules relation shared by the live and twin forms (hourly
    grain: the bounds differ from batch-41's daily ones)."""
    rules = [
        (1, "error_rate", ">", 0.30, "page"),
        (2, "events_total", ">", 25.0, "info"),
        (3, "purchases", "<", 1.0, "warn"),
    ]
    return spark.createDataFrame(
        rules,
        "rule_id INT, metric STRING, op STRING, bound DOUBLE, severity STRING",
    )


def _apply_rules(metrics: DataFrame, rules: DataFrame) -> DataFrame:
    return (
        metrics.join(F.broadcast(rules), "metric")
        .where(
            ((F.col("op") == ">") & (F.col("value") > F.col("bound")))
            | ((F.col("op") == "<") & (F.col("value") < F.col("bound")))
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm").alias("hour"),
            "rule_id",
            "metric",
            "severity",
            F.round("value", 6).alias("value"),
        )
    )


def _metrics_long(hourly: DataFrame) -> DataFrame:
    return (
        hourly.select("hour", F.lit("events_total").alias("metric"),
                      F.col("events_total").alias("value"))
        .unionByName(hourly.select("hour", F.lit("error_rate").alias("metric"),
                                   F.col("error_rate").alias("value")))
        .unionByName(hourly.select("hour", F.lit("purchases").alias("metric"),
                                   F.col("purchases").alias("value")))
    )


def alert_rules_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin the live run must equal (pytest-pinned)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").cast("double").alias("events_total"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("error_rate"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
    )
    return _apply_rules(_metrics_long(hourly), _hourly_alert_rules(spark))


@declare("stream_live_alert_rules", oracle=None)  # rows-only: true streaming
def stream_live_alert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The alerting engine ON the stream: watermarked hourly aggregation
    over the event stream; each micro-batch's completed metrics go long-
    form and join the broadcast rules relation inside foreachBatch — the
    production shape for logic that must run AFTER a streaming aggregate
    (stream-static joins can't follow an aggregation in one plan), and
    the same place a real deployment posts to its pager. availableNow
    drains the backlog exactly once; complete-mode output keeps late
    hours correct (each batch re-emits full state, so the LAST batch's
    alert set is the final answer). Rows-only (a real streaming run);
    the drained alert set is pytest-pinned equal to
    alert_rules_batch_twin."""
    import tempfile
    import uuid

    from ..streaming.jobs import read_events_stream

    events = read_events_stream(spark, sf_dir)
    hourly = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").cast("double").alias("events_total"),
            (
                F.sum(
                    F.when(F.col("event_type") == "error", 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("error_rate"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("double")
            .alias("purchases"),
        )
    )
    rules = _hourly_alert_rules(spark)
    holder: dict = {}

    def fire_alerts(batch_df: DataFrame, batch_id: int) -> None:
        # Runs on the driver per micro-batch: long-form the completed
        # metrics and join the broadcast rules — the pager hook. Complete
        # mode re-emits full state, so each batch OVERWRITES the holder.
        holder["alerts"] = _apply_rules(
            _metrics_long(batch_df), rules
        ).localCheckpoint(eager=True)

    ckpt = tempfile.mkdtemp(prefix=f"ckpt_alerts_{uuid.uuid4().hex[:8]}_")
    q = (
        hourly.writeStream.foreachBatch(fire_alerts)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("stream_live_alert_rules did not drain within 120s")
    return holder["alerts"]


_N_BAD_LINES = 25


def _quarantine_layout(spark: SparkSession, sf_dir: str) -> str:
    """Clean CSV export of documents plus one part-file of known-bad
    lines (wrong arity / broken quoting) — the landing zone a real feed
    delivers. Identity-cached per fixture generation."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:quar".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"documents_quarantine_{digest}")
    marker = os.path.join(path, "_BAD_INJECTED")
    if not os.path.exists(marker):
        d = load_table(spark, sf_dir, "documents")
        d.write.mode("overwrite").option("header", "true").csv(path)
        bad = os.path.join(path, "part-zz-badfeed.csv")
        with open(bad, "w") as fh:
            # header first: with header=true Spark drops line 1 of EVERY
            # file, so the bad feed carries a proper header too
            fh.write(",".join(f.name for f in d.schema.fields) + "\n")
            for i in range(_N_BAD_LINES):
                # 3 fields against a 5-column schema with an unclosed
                # quote: unparseable under the declared schema
                fh.write(f'"broken{i},oops,{i}\n')
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return path


@declare(
    "source_csv_quarantine",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_good,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '__quarantined__', {_N_BAD_LINES}, 0
    """,
)
def source_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE landing-zone ingest with quarantine routing, declared:
    the layout is a clean CSV export of documents PLUS a part-file of 25
    known-malformed lines (wrong arity, broken quoting). The tolerant
    reader (sources/io_formats.py read_csv_tolerant) types the clean
    rows and captures each bad line in _corrupt_record; the query routes
    them into a per-lang rollup plus one quarantine row. The oracle
    recomputes the clean side from the ORIGINAL parquet and states the
    injected bad count, so agreement proves (a) no clean row was lost or
    mistyped through the corrupted file, (b) exactly the breakage was
    quarantined. At 100 TB the quarantine branch writes to its own table
    for replay after the upstream fix — same plan, different sink."""
    from ..sources import SCHEMAS
    from ..sources.io_formats import read_csv_tolerant

    path = _quarantine_layout(spark, sf_dir)
    # cache() is Spark's REQUIRED idiom here: a query referencing only
    # the internal corrupt-record column is disallowed against a raw CSV
    # scan (the parser would have to re-run per branch); the cached
    # landing batch is micro-batch-sized by construction.
    from ..operators.caching import persist_bounded

    raw = persist_bounded(
        "quarantine_raw",
        read_csv_tolerant(spark, path, SCHEMAS["documents"], mode="PERMISSIVE"),
    )
    good = raw.where(F.col("_corrupt_record").isNull())
    bad = raw.where(F.col("_corrupt_record").isNotNull())
    per_lang = good.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_good"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    quarantine = bad.agg(
        F.count("*").cast("long").alias("n_good")
    ).select(
        F.lit("__quarantined__").alias("lang"),
        "n_good",
        F.lit(0).cast("long").alias("chars_total"),
    )
    return per_lang.unionByName(quarantine)


@declare("fn_aes_roundtrip", oracle=None)  # rows-only: DuckDB has no AES
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption at rest: customer names encrypt with
    aes_encrypt (ECB — deterministic by design here so the declared
    result is run-stable and equality-joinable on ciphertext; production
    randomizes with GCM and gives up those properties deliberately),
    decrypt back, and the roundtrip identity rides IN the result
    alongside ciphertext length. This is the governance tier below
    masking: mask() destroys the value, encryption preserves it for
    key-holders. Pure codegen (JVM Cipher), scan-speed at any scale.
    Rows-only: DuckDB ships no AES; pytest pins roundtrip-true on every
    row and cross-run ciphertext determinism."""
    # 16-byte demo key inline; production sources it from a KMS.
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    enc = c.select(
        "c_custkey",
        F.expr(
            "aes_encrypt(c_name, '0123456789abcdef', 'ECB')"
        ).alias("ct"),
        "c_name",
    )
    return enc.select(
        "c_custkey",
        F.length("ct").cast("long").alias("ct_bytes"),
        (
            F.expr(
                "cast(aes_decrypt(ct, '0123456789abcdef', 'ECB') as string)"
            )
            == F.col("c_name")
        ).alias("roundtrip_ok"),
        F.sha2(F.hex("ct"), 256).substr(1, 16).alias("ct_fingerprint"),
    )
