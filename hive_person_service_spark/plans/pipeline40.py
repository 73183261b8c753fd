"""Round-4 continuation batch 40: grid-bucketed spatial join and video
scene-cut detection.

- geo_grid_join: the SCALE TIER geo_nearest_supplier's docstring
  promises — spatial nearest-neighbor through grid-cell bucketing
  (facilities replicate to their 3x3 neighborhood, people probe their
  own cell; candidates meet in an EQUI-join) instead of the all-pairs
  broadcast. The tier's contract is nearest-within-one-cell — the
  oracle states exactly that restriction, and the recall against the
  exact all-pairs answer is pytest-measured, the same
  honesty discipline as the IVF/LSH ANN tiers.
- multimodal_scene_cuts: frame-delta scene-cut detection over
  synthesized video frames (integer SAD per consecutive-frame pair,
  arg-max = the cut) — the shot-boundary primitive a video curation
  pipeline runs right after frame decode; deterministic pixel formulas
  keep the whole thing oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline24 import _md5_long
from .registry import declare


@declare(
    "geo_grid_join",
    oracle="""
    WITH cust AS (
      SELECT c_custkey,
             (('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000) / 100000.0 AS lat,
             (('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000) / 100000.0 AS lon
      FROM customer
    ), supp AS (
      SELECT s_suppkey,
             (('0x' || substr(md5('lat:s' || CAST(s_suppkey AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000) / 100000.0 AS lat,
             (('0x' || substr(md5('lon:s' || CAST(s_suppkey AS VARCHAR)), 1, 8))::UBIGINT
              % 1000000) / 100000.0 AS lon
      FROM supplier
    ), cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS d2
      FROM cust c JOIN supp s
        ON abs(floor(c.lat) - floor(s.lat)) <= 1
       AND abs(floor(c.lon) - floor(s.lon)) <= 1
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, d2 AS dist2,
           CAST(COUNT(*) OVER (PARTITION BY c_custkey) AS BIGINT)
             AS n_candidates
    FROM cand
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_custkey
                               ORDER BY d2, s_suppkey) = 1
    """,
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial NN — the scale tier of geo_nearest_supplier:
    each facility replicates to its 3x3 cell neighborhood (9x a
    dim-sized relation), each person keys by its own unit cell, and
    candidates meet through a plain EQUI-join on the cell id — at 100 TB
    neither side is broadcast and the shuffle carries only co-located
    cell residents, exactly the IVF cell-probe shape with geography as
    the quantizer. The declared contract is nearest-WITHIN-ONE-CELL
    (candidates limited to the neighborhood; people in facility-free
    neighborhoods have no row) and the oracle states the same
    restriction, so the tier is exact against its own contract;
    tests/test_pipeline40.py measures recall against the exact all-pairs
    answer (the ANN-tier honesty discipline). The per-person argmin is
    the two-pass codegen shape, and n_candidates makes the probe fanout
    visible in the result."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((_md5_long(F.concat(F.lit("lat:"), F.col("c_custkey").cast("string"))) % 1000000)
         / 100000.0).alias("lat"),
        ((_md5_long(F.concat(F.lit("lon:"), F.col("c_custkey").cast("string"))) % 1000000)
         / 100000.0).alias("lon"),
    )
    sc = spark.sparkContext
    if c.rdd.getNumPartitions() < sc.defaultParallelism:
        c = c.repartition(sc.defaultParallelism)
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((_md5_long(F.concat(F.lit("lat:s"), F.col("s_suppkey").cast("string"))) % 1000000)
         / 100000.0).alias("s_lat"),
        ((_md5_long(F.concat(F.lit("lon:s"), F.col("s_suppkey").cast("string"))) % 1000000)
         / 100000.0).alias("s_lon"),
    )
    # replicate each facility to its 3x3 neighborhood of unit cells
    s_rep = s.select(
        "s_suppkey", "s_lat", "s_lon",
        F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
    ).select(
        "s_suppkey", "s_lat", "s_lon", "dx",
        F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
    ).select(
        "s_suppkey", "s_lat", "s_lon",
        (F.floor("s_lat") + F.col("dx")).cast("long").alias("cla"),
        (F.floor("s_lon") + F.col("dy")).cast("long").alias("clo"),
    )
    keyed = c.select(
        "c_custkey", "lat", "lon",
        F.floor("lat").cast("long").alias("cla"),
        F.floor("lon").cast("long").alias("clo"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    cand = keyed.join(s_rep, ["cla", "clo"]).select(
        "c_custkey", "s_suppkey", d2.alias("d2")
    )
    best = (
        cand.groupBy("c_custkey")
        .agg(F.min("d2").alias("best_d2"), F.count("*").alias("n_candidates"))
        .select(
            F.col("c_custkey").alias("b_custkey"), "best_d2",
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )
    return (
        cand.join(
            best,
            (F.col("c_custkey") == F.col("b_custkey"))
            & (F.col("d2") == F.col("best_d2")),
        )
        .groupBy("c_custkey", "best_d2", "n_candidates")
        .agg(F.min("s_suppkey").alias("nearest_suppkey"))
        .select(
            "c_custkey",
            "nearest_suppkey",
            F.col("best_d2").alias("dist2"),
            "n_candidates",
        )
    )


# Scene-cut synthesis parameters: 8 frames of 16x16 gray8; the cut frame
# s = 2 + id % 5 switches the pixel generator.
SC_FRAMES = 8
SC_W = 16
SC_H = 16


@declare(
    "multimodal_scene_cuts",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id AS asset_id, 2 + doc_id % 5 AS s
      FROM documents WHERE doc_id % 5 = 0),
    grid AS (
      SELECT asset_id, s, f.f, x.x, y.y
      FROM ids
      CROSS JOIN (SELECT unnest(generate_series(1, {SC_FRAMES - 1})) AS f) f
      CROSS JOIN (SELECT unnest(generate_series(0, {SC_W - 1})) AS x) x
      CROSS JOIN (SELECT unnest(generate_series(0, {SC_H - 1})) AS y) y),
    px AS (
      SELECT asset_id, f,
             abs(
               (CASE WHEN f < s THEN (3 * x + 7 * y + asset_id + 2 * f) % 256
                     ELSE (5 * x + 11 * y + asset_id + 2 * f + 97) % 256 END)
               -
               (CASE WHEN f - 1 < s
                     THEN (3 * x + 7 * y + asset_id + 2 * (f - 1)) % 256
                     ELSE (5 * x + 11 * y + asset_id + 2 * (f - 1) + 97) % 256
                END)) AS adiff
      FROM grid),
    sad AS (
      SELECT asset_id, f, CAST(SUM(adiff) AS BIGINT) AS sad
      FROM px GROUP BY asset_id, f),
    ranked AS (
      SELECT asset_id, f, sad,
             row_number() OVER (PARTITION BY asset_id
                                ORDER BY sad DESC, f) AS rn
      FROM sad)
    SELECT asset_id, CAST(f AS BIGINT) AS cut_frame, sad AS max_sad
    FROM ranked WHERE rn = 1
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over video frames: per asset, synthesize
    8 deterministic 16x16 gray frames with a generator switch at the cut
    frame (s = 2 + id%5), compute the integer sum-of-absolute-differences
    between consecutive frames in numpy (one Arrow stage, vectorized
    over the whole frame tensor), and report the arg-max transition —
    the primitive a video curation pipeline runs right after decode to
    split footage into shots. Integer SAD end to end => no float drift;
    the oracle re-derives every pixel arithmetically, so a match proves
    the frame synthesis, the tensor diff, and the arg-max together. The
    id%5 slice bounds Python-side work; at 100 TB the same mapInPandas
    streams (asset, frame-range) batches with constant memory, and only
    flagged boundaries flow downstream."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("asset_id"))
    )
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("cut_frame", LongType()),
            StructField("max_sad", LongType()),
        ]
    )
    x = np.arange(SC_W, dtype=np.int64)[None, :]
    y = np.arange(SC_H, dtype=np.int64)[:, None]

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf["asset_id"].astype("int64"):
                aid = int(aid)
                s = 2 + aid % 5
                frames = np.stack(
                    [
                        ((3 * x + 7 * y + aid + 2 * f) % 256)
                        if f < s
                        else ((5 * x + 11 * y + aid + 2 * f + 97) % 256)
                        for f in range(SC_FRAMES)
                    ]
                )
                sad = np.abs(np.diff(frames, axis=0)).sum(axis=(1, 2))
                best = int(np.argmax(sad))  # first max: the f tie-break
                out.append((aid, best + 1, int(sad[best])))
            yield pd.DataFrame(out, columns=["asset_id", "cut_frame", "max_sad"])

    return d.mapInPandas(cuts, schema)
