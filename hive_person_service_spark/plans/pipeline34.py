"""Round-4 continuation batch 34: Hive script TRANSFORM, feature-store
point-in-time join, column masking, CUSUM changepoints, skyline query,
snapshot rollback, audio spectral features.

- hive_transform_script: Hive's SELECT TRANSFORM ... USING '<script>'
  (external-process row transform) — the last big HiveQL surface the
  registry had not declared; runs a real Unix process per task.
- scd2_point_in_time_join: the feature-store lookup — facts joined to a
  versioned SCD2 dimension AS OF each fact's event time (no leakage from
  the future), built on operators/scd.py.
- governance_column_masking: Spark's mask() for PII-safe exports, oracle
  re-derived with an equivalent regex chain.
- events_changepoint_cusum: CUSUM changepoint detection per event type —
  the level-shift detector (anomaly/MAD/spike queries find points;
  CUSUM finds WHERE the mean moved).
- parts_skyline: 2-D skyline (Pareto-front) per brand via the
  sort + prefix-cummax formulation — O(n log n), not the naive
  all-pairs dominance join the oracle uses.
- table_snapshot_rollback: operator rollback() declared — current
  pointer flipped back to the pre-delete snapshot, read path proves it.
- multimodal_audio_spectral: rows-only FFT spectral centroid over
  synthesized PCM (numpy rfft is not SQL-expressible; pytest pins it
  against a direct numpy reference).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


@declare(
    "hive_transform_script",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           upper(c_name) AS name_upper,
           upper(c_mktsegment) AS seg_upper
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def hive_transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL SELECT TRANSFORM ... USING: rows serialized to a real
    external Unix process (`tr a-z A-Z`) over stdin/stdout with the
    default tab-delimited row format, parsed back into typed columns —
    Hive's script-transform escape hatch (streaming jobs, legacy perl/
    python ETL) reproduced on Spark's ScriptTransformation operator. One
    process per task, pipelined — no materialization around the script;
    at 100 TB the script scales with tasks exactly like Hive streaming
    did. The oracle applies the equivalent upper() in SQL, proving the
    round-trip through the process preserved every row, key and column
    boundary."""
    load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    ).createOrReplaceTempView("_tf_customer")
    out = spark.sql(
        """
        SELECT TRANSFORM(c_custkey, c_name, c_mktsegment)
        USING 'tr a-z A-Z'
        AS (k STRING, name_upper STRING, seg_upper STRING)
        FROM _tf_customer
        """
    )
    return out.select(
        F.col("k").cast("long").alias("c_custkey"), "name_upper", "seg_upper"
    )


@declare(
    "scd2_point_in_time_join",
    oracle="""
    WITH upd AS (
      SELECT user_id, value AS balance, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'signup'),
    dedup AS (
      SELECT user_id, balance, ts FROM (
        SELECT user_id, balance, ts,
               LAG(balance) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM upd)
      WHERE prev_ts IS NULL OR balance IS DISTINCT FROM prev),
    hist AS (
      SELECT user_id, balance, ts AS effective_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS effective_to
      FROM dedup),
    facts AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'),
    joined AS (
      SELECT f.user_id, h.balance
      FROM facts f LEFT JOIN hist h
        ON f.user_id = h.user_id
       AND f.ts >= h.effective_from
       AND (h.effective_to IS NULL OR f.ts < h.effective_to))
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(balance) AS BIGINT) AS n_with_feature,
           ROUND(SUM(balance), 2) AS balance_sum
    FROM joined GROUP BY user_id
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store POINT-IN-TIME join: purchase facts look up the
    signup-balance dimension version valid AT EACH FACT'S event time —
    half-open [effective_from, effective_to) intervals from the real
    operators/scd.py merge, so no future leakage (the train-serving-skew
    bug PIT joins exist to prevent) and pre-first-version facts surface
    as n_with_feature < n_purchases instead of silently dropping. The
    join is an EQUI-join on user_id with the interval predicate as a
    residual filter — per-user version counts are bounded, so fan-out is
    bounded and the plan is a plain SMJ, never a BNLJ; at 100 TB both
    sides shuffle once on the same key."""
    from ..operators.scd import scd2_merge

    ev_dim = load_table(spark, sf_dir, "events")
    ev_fact = load_table(spark, sf_dir, "events")  # separate lineage: self-join
    upd = ev_dim.where(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("balance"), "ts"
    )
    empty_hist = upd.limit(0).select(
        "user_id",
        "balance",
        F.col("ts").alias("effective_from"),
        F.col("ts").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    hist = scd2_merge(empty_hist, upd, ["user_id"], ["balance"], "ts").select(
        F.col("user_id").alias("h_user"), "balance", "effective_from", "effective_to"
    )
    facts = ev_fact.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = facts.join(
        hist,
        (facts.user_id == hist.h_user)
        & (facts.ts >= hist.effective_from)
        & (hist.effective_to.isNull() | (facts.ts < hist.effective_to)),
        "left",
    )
    return joined.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.count("balance").cast("long").alias("n_with_feature"),
        F.round(F.sum("balance"), 2).alias("balance_sum"),
    )


@declare(
    "governance_column_masking",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[a-z]', 'x', 'g'), '[A-Z]', 'X', 'g'), '[0-9]', 'n', 'g')
             AS name_masked,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band
    FROM customer WHERE c_custkey < 200
    """,
)
def governance_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-safe export surface: Spark's mask() redacts character classes
    (upper->X, lower->x, digit->n, punctuation kept) and the account
    balance generalizes to a 1000-wide band — the column-masking +
    generalization combo a governed view applies for analyst access
    (k-anonymity/l-diversity queries audit the result; this produces
    it). Pure codegen expressions — masking at 100 TB costs the same as
    any projection. The oracle re-derives mask() with an equivalent
    regex chain (lower first, so the introduced x/X/n are never
    re-matched), proving the masking semantics, not just the shape."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") < 200).select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("acctbal_band"),
    )


@declare(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, AVG(CAST(c AS DOUBLE)) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type),
    cusum AS (
      SELECT d.event_type, d.day, s.n_days,
             SUM(CAST(d.c AS DOUBLE) - s.mu) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      FROM daily d JOIN stats s USING (event_type)),
    ranked AS (
      SELECT event_type, day, n_days, cs,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ABS(cs) DESC, day) AS rn
      FROM cusum)
    SELECT event_type, CAST(day AS VARCHAR) AS change_day,
           ROUND(cs, 4) AS peak_cusum, n_days
    FROM ranked WHERE rn = 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: cumulative sum of
    (daily count - overall mean) peaks exactly where the level shifts —
    the standard detector for 'WHEN did the rate change' (the anomaly/
    spike queries answer 'which points are odd'; CUSUM localizes a mean
    shift). The fact table collapses to (type, day) FIRST, so the
    ordered cumulative window runs over a date-range-bounded relation
    partitioned by type — the few-groups discipline. The running sum
    accumulates in ORDER BY day in both engines (identical fp order =>
    identical doubles); the peak row is tie-broken on day."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.avg(F.col("c").cast("double")).alias("mu"),
        F.count("*").cast("long").alias("n_days"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = daily.join(F.broadcast(stats), "event_type").withColumn(
        "cs", F.sum(F.col("c").cast("double") - F.col("mu")).over(w_run)
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cs")).desc(), "day"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").cast("string").alias("change_day"),
            F.round("cs", 4).alias("peak_cusum"),
            "n_days",
        )
    )


@declare(
    "parts_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, CAST(p.p_size AS BIGINT)
             AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) per brand: parts not dominated on
    (cheaper price, larger size). The oracle states dominance directly
    as a quadratic NOT EXISTS; the engine computes the SAME set in
    O(n log n): collapse to per-(brand, price) max size, one ordered
    window takes the prefix-cummax of size over strictly-cheaper
    prices, and a level survives iff its max size exceeds that cummax —
    then join back to recover the parts (ties at an identical (price,
    size) are mutually non-dominated and all kept). The heavy relation
    is touched by one groupBy and one bounded join; the window runs
    over price LEVELS per brand, not parts. This is the multi-criteria
    'best offers' operator done without an all-pairs join — the shape
    that survives 100x."""
    p = load_table(spark, sf_dir, "part")
    levels = p.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("m_size")
    )
    w_prev = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky_levels = (
        levels.withColumn("prev_max", F.max("m_size").over(w_prev))
        .where(F.col("prev_max").isNull() | (F.col("m_size") > F.col("prev_max")))
        .select("p_brand", "p_retailprice", "m_size")
    )
    return (
        p.join(
            sky_levels,
            ["p_brand", "p_retailprice"],
        )
        .where(F.col("p_size") == F.col("m_size"))
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )


@declare(
    "table_snapshot_rollback",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def table_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ROLLBACK declared end-to-end: version 1 holds the full
    orders projection, version 2 a bad batch delete (the oops), and
    rollback(1) flips the current pointer back — a manifest write,
    instant at any table size because snapshots are immutable
    (operators/snapshots.py; time travel and the change feed are the
    sibling queries). The query reads the CURRENT table after rollback
    and aggregates; the oracle recomputes from the pristine fixture, so
    agreement proves the rollback restored exactly the pre-delete rows.
    The integer-cents checksum keeps the comparison float-safe."""
    from ..operators.snapshots import SnapshotTable

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:rb".encode()
    ).hexdigest()[:12]
    root = os.path.join(_LAYOUT_ROOT, f"orders_rollback_{digest}")
    snap = SnapshotTable(spark, root)
    hist = snap.history()
    if len(hist) < 2:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        snap = SnapshotTable(spark, root)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        snap.write(o, note="initial load")
        snap.write(
            o.where(F.col("o_orderstatus") != "F"), note="bad batch delete"
        )
        snap.rollback(1)
    cur = snap.read()  # current pointer: back at version 1
    return cur.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


SPECTRAL_WINDOW = 256
SPECTRAL_N_SAMPLES = 2048


@declare("multimodal_audio_spectral", oracle=None)  # rows-only: FFT not SQL
def multimodal_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction beyond energy: per 256-sample window,
    FFT spectral centroid (mean frequency bin weighted by magnitude)
    and high-band energy ratio over the SAME deterministic s16le PCM the
    RMS query synthesizes (sample n = ((n*31 + id*7) mod 65536) - 32768)
    — numpy rfft per Arrow batch, constant memory per task. The DFT is
    not SQL-expressible => rows-only; tests/test_pipeline34.py recomputes
    the identical centroid with plain numpy and pins equality, and the
    deterministic synth makes every run/partitioning bit-stable. The
    doc_id < 100 slice bounds Python-side work at every sf."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id")
    )
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("win_id", LongType()),
            StructField("centroid", DoubleType()),
            StructField("high_ratio", DoubleType()),
        ]
    )
    W, N = SPECTRAL_WINDOW, SPECTRAL_N_SAMPLES

    def spectral(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf["doc_id"].astype("int64"):
                n = np.arange(N, dtype=np.int64)
                pcm = ((n * 31 + int(aid) * 7) % 65536 - 32768).astype(np.float64)
                for w_id in range(N // W):
                    seg = pcm[w_id * W : (w_id + 1) * W]
                    mag = np.abs(np.fft.rfft(seg))
                    total = float(mag.sum())
                    bins = np.arange(len(mag), dtype=np.float64)
                    centroid = float((bins * mag).sum() / total) if total else 0.0
                    high = float(mag[len(mag) // 2 :].sum() / total) if total else 0.0
                    out.append((int(aid), w_id, round(centroid, 6), round(high, 6)))
            yield pd.DataFrame(
                out, columns=["asset_id", "win_id", "centroid", "high_ratio"]
            )

    return d.mapInPandas(spectral, schema)
