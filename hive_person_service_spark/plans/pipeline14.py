"""Batch 15 — grouping metadata, distribution divergence, audio DSP,
compressibility (round 2):

- agg_grouping_id: ROLLUP with GROUPING()/GROUPING_ID() metadata columns
  (how BI layers distinguish subtotal rows from real NULL groups).
- text_js_divergence: Jensen-Shannon divergence between two sources'
  unigram distributions (symmetric, bounded corpus-drift measure over the
  vocabulary; full-outer join of the two distributions).
- multimodal_audio_rms: per-window RMS energy over synthesized s16le PCM
  -- REAL byte-level DSP via Arrow batches; the oracle re-derives every
  sample arithmetically (the audio twin of multimodal_resize).
- text_compression_ratio: zlib compressibility per document (the
  boilerplate/repetition quality signal Gopher-style filters use).
  Rows-only: zlib output is library-versioned; pytest pins the invariants.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

RMS_WINDOW = 256  # samples per RMS window
RMS_N_SAMPLES = 2048  # synthesized samples per asset


@declare(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING / GROUPING_ID metadata: subtotal rows carry
    grouping flags so consumers can tell 'subtotal over priority' from 'a
    priority that is NULL' -- the cube-metadata surface BI tools read.
    Same shuffle shape as a plain rollup (partial aggregation per
    grouping set)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n"),
    )
    return g.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "g_status",
        "gid",
        "n",
    )


@declare(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE source IN ('src0', 'src1')),
    c AS (
      SELECT w,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
      FROM tok GROUP BY w),
    tot AS (SELECT SUM(c0) AS t0, SUM(c1) AS t1 FROM c),
    pq AS (
      SELECT CAST(c0 AS DOUBLE) / t0 AS p, CAST(c1 AS DOUBLE) / t1 AS q
      FROM c CROSS JOIN tot)
    SELECT ROUND(SUM(
             CASE WHEN p > 0 THEN 0.5 * p * log2(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * log2(q / ((p + q) / 2)) ELSE 0 END
           ), 6) AS jsd
    FROM pq
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between src0's and src1's unigram
    distributions: one corpus tokenize+groupBy builds both count columns
    at once (no separate per-source passes, no outer join needed), totals
    ride along as a broadcast 1-row aggregate, the KL terms fold in a
    single vocabulary-sized aggregate. Symmetric and bounded [0, 1] in
    log2 -- the corpus-mixture drift measure to pair with the numeric KS
    gate (quality_ks_drift)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.where(F.col("source").isin("src0", "src1")).select(
        "source", F.explode(tokens_expr()).alias("w")
    )
    c = tok.groupBy("w").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
    )
    tot = c.agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    pq = c.crossJoin(F.broadcast(tot)).select(
        (F.col("c0").cast("double") / F.col("t0")).alias("p"),
        (F.col("c1").cast("double") / F.col("t1")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term_p = F.when(
        F.col("p") > 0, 0.5 * F.col("p") * F.log2(F.col("p") / m)
    ).otherwise(0.0)
    term_q = F.when(
        F.col("q") > 0, 0.5 * F.col("q") * F.log2(F.col("q") / m)
    ).otherwise(0.0)
    return pq.agg(F.round(F.sum(term_p + term_q), 6).alias("jsd"))


@declare(
    "multimodal_audio_rms",
    oracle=f"""
    WITH win AS (
      SELECT doc_id AS asset_id,
             unnest(generate_series(0, {RMS_N_SAMPLES // RMS_WINDOW - 1}))
               AS win_id
      FROM documents),
    samp AS (
      SELECT asset_id, win_id,
             ((win_id * {RMS_WINDOW} + i) * 31 + asset_id * 7) % 65536 - 32768
               AS s
      FROM win CROSS JOIN
           (SELECT unnest(generate_series(0, {RMS_WINDOW - 1})) AS i))
    SELECT asset_id, CAST(win_id AS BIGINT) AS win_id,
           FLOOR(SQRT(SUM(CAST(s AS DOUBLE) * s) / {RMS_WINDOW}) * 1e4 + 0.5)
             / 1e4 AS rms
    FROM samp GROUP BY asset_id, win_id
    """,
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over RAW PCM BYTES: synthesize s16le samples
    (sample k of asset a = (k*31 + a*7) mod 65536 - 32768, packed
    little-endian into a binary blob), then compute per-256-sample-window
    RMS with numpy over Arrow batches -- real byte-level audio DSP, no
    audio library needed. The oracle re-derives every sample
    arithmetically, so a match proves the pack -> parse -> window -> RMS
    byte path (the audio twin of multimodal_resize). FLOOR-half-up 4dp on
    the transcendental output."""
    from collections.abc import Iterator

    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id")
    )
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("win_id", LongType()),
            StructField("rms", DoubleType()),
        ]
    )
    n, wlen = RMS_N_SAMPLES, RMS_WINDOW

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n, dtype=np.int64)
        for pdf in batches:
            out = []
            for aid in pdf["asset_id"].astype("int64"):
                samples = ((k * 31 + int(aid) * 7) % 65536 - 32768).astype(
                    np.int16
                )
                blob = samples.tobytes()  # s16le pack
                parsed = np.frombuffer(blob, dtype="<i2").astype(np.float64)
                w = parsed.reshape(-1, wlen)
                r = np.sqrt((w * w).sum(axis=1) / wlen)
                r = np.floor(r * 1e4 + 0.5) / 1e4
                out.extend(
                    (int(aid), int(i), float(r[i])) for i in range(len(r))
                )
            yield pd.DataFrame(out, columns=["asset_id", "win_id", "rms"])

    return d.mapInPandas(rms, out_schema)


@declare("text_compression_ratio", oracle=None)  # rows-only: zlib versioned
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compressibility per document (compressed/raw bytes): highly
    repetitive or templated text compresses far below typical prose -- the
    classic cheap boilerplate signal in Gopher-style quality stacks.
    Arrow-batched pandas UDF over stdlib zlib (level pinned). Rows-only:
    compressed size is zlib-version-dependent; pytest pins the invariants
    (repetition compresses more; ratio bounds; determinism in-session)."""
    import zlib

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def comp_ratio(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                round(len(zlib.compress(t.encode("utf-8"), 6)) / len(t), 6)
                if t
                else 1.0
                for t in texts
            ]
        )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", comp_ratio("text").alias("compression_ratio")
    )
