"""Round-4 continuation batch 37: data-quality expectations, image
retrieval plumbing, sketch-window composition.

- dq_expectations_report: the assertion-based data-quality gate
  (uniqueness, referential integrity, domain ranges, non-null) emitted
  as a (check, violations, passed) report — the contract a pipeline
  validates BEFORE publishing a table (quality_profile is the
  descriptive sibling; this one has pass/fail semantics).
- multimodal_image_retrieval: the full image-retrieval data path —
  decode real containers (PGM/BMP/PNG), extract a deterministic
  feature vector, cosine top-k against the corpus — with the feature
  extractor as the documented deterministic STAND-IN for a learned
  encoder (the container has no ML runtime; the Spark-side plumbing is
  what ships). Fully oracle-checked: the fake encoder is arithmetic.
- events_wau_hll_sliding: 7-day rolling distinct users computed by
  MERGING per-day HLL sketches (one sketch build, 7x reuse) — the
  rollup-reuse pattern that replaces 7 full distinct scans at 100 TB;
  exact twin rides in the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "dq_expectations_report",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM
                 (SELECT o_orderkey FROM orders
                  GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_fk_nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'discount_in_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT)
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assertion-based data-quality gate: six expectations (primary-key
    uniqueness, two referential-integrity checks via LEFT ANTI joins,
    a domain range, a non-null, a positivity) each reduced to a
    violation count and unioned into the publish-gate report. The FK
    checks are anti-joins shuffled on the key (broadcast when the parent
    side is dim-sized); everything else is a single-scan aggregate.
    This is the executable contract a 100 TB pipeline runs between
    'wrote the table' and 'published the table' — the report IS the
    gate: any n_violations > 0 blocks downstream."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def one(name: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("long").alias("n_violations"),
        )

    pk_dups = (
        o.groupBy("o_orderkey")
        .count()
        .where(F.col("count") > 1)
        .agg(F.count("*").alias("v"))
    )
    fk_li = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    fk_cust = (
        c.join(
            F.broadcast(n.select("n_nationkey")),
            c.c_nationkey == n.n_nationkey,
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
    )
    disc = li.where(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    ).agg(F.count("*").alias("v"))
    ship_null = li.where(F.col("l_shipdate").isNull()).agg(F.count("*").alias("v"))
    price_pos = o.where(F.col("o_totalprice") <= 0).agg(F.count("*").alias("v"))

    return (
        one("orders_pk_unique", pk_dups)
        .unionByName(one("lineitem_fk_orders", fk_li))
        .unionByName(one("customer_fk_nation", fk_cust))
        .unionByName(one("discount_in_range", disc))
        .unionByName(one("shipdate_not_null", ship_null))
        .unionByName(one("totalprice_positive", price_pos))
    )


@declare(
    "multimodal_image_retrieval",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 16 + doc_id % 8 AS w, 16 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT asset_id, w, h, (3 * gx.x + 7 * gy.y + asset_id) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT unnest(generate_series(0, 22)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS y) gy
      WHERE gx.x < w AND gy.y < h),
    feat AS (
      SELECT asset_id,
             [AVG(v) / 255.0,
              SUM(CASE WHEN v < 128 THEN 1.0 ELSE 0 END) / COUNT(*),
              ANY_VALUE(w) / 23.0,
              ANY_VALUE(h) / 20.0] AS f
      FROM px GROUP BY asset_id),
    q AS (SELECT f AS qf FROM feat WHERE asset_id = 0),
    scored AS (
      SELECT f.asset_id,
             list_dot_product(f.f, (SELECT qf FROM q))
               / (sqrt(list_dot_product(f.f, f.f))
                  * sqrt(list_dot_product((SELECT qf FROM q),
                                          (SELECT qf FROM q)))) AS cos_raw
      FROM feat f WHERE f.asset_id <> 0)
    SELECT asset_id, ROUND(cos_raw, 6) AS cosine
    FROM scored ORDER BY cos_raw DESC, asset_id LIMIT 10
    """,
)
def multimodal_image_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image retrieval end to end: REAL container decode (PGM/BMP/PNG
    rotating by id) -> feature extraction -> cosine top-k against the
    image corpus. The feature extractor is a deterministic STAND-IN for
    a learned encoder (mean luma, dark ratio, normalized dims — the
    container ships no ML runtime; SURVEY §2.J's stub discipline), which
    is exactly what makes the WHOLE retrieval path oracle-checkable: the
    oracle re-derives features from the pixel formula, so a match proves
    decode, batched feature extraction, normalization and the top-k
    ranking together. Swap the stand-in for a real encoder UDF and
    nothing else changes — the Spark plumbing (one Arrow decode stage,
    broadcast query vector, TakeOrderedAndProject) is the part that
    ships."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..operators.multimodal import decode_image, synth_encoded_images

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select(F.col("doc_id").alias("asset_id"))
    )
    assets = synth_encoded_images(d)
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("f", ArrayType(DoubleType())),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
                px = decode_image(bytes(blob)).astype(np.float64)
                h, w = px.shape
                out.append(
                    (
                        int(aid),
                        [
                            float(px.mean() / 255.0),
                            float((px < 128).mean()),
                            w / 23.0,
                            h / 20.0,
                        ],
                    )
                )
            yield pd.DataFrame(out, columns=["asset_id", "f"])

    feat = assets.mapInPandas(featurize, schema)
    q = feat.where(F.col("asset_id") == 0).select(F.col("f").alias("qf"))
    dot = F.expr(
        "aggregate(zip_with(f, qf, (a, b) -> a * b),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    n1 = F.expr(
        "sqrt(aggregate(zip_with(f, f, (a, b) -> a * b),"
        " cast(0.0 as double), (acc, x) -> acc + x))"
    )
    n2 = F.expr(
        "sqrt(aggregate(zip_with(qf, qf, (a, b) -> a * b),"
        " cast(0.0 as double), (acc, x) -> acc + x))"
    )
    return (
        feat.where(F.col("asset_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("asset_id", (dot / (n1 * n2)).alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), "asset_id")
        .limit(10)
        .select("asset_id", F.round("cos_raw", 6).alias("cosine"))
    )


@declare("events_wau_hll_sliding", oracle=None)  # rows-only: binary sketches
def events_wau_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct users from MERGED per-day HLL sketches:
    build each day's sketch ONCE (one pass over events), then every
    rolling window unions 7 tiny sketches instead of re-scanning 7 days
    of raw facts — the rollup-reuse arithmetic that makes sliding
    distinct-count affordable at 100 TB (events_rolling_wau is the exact
    full-scan twin). The 7x fan-out join runs over the day-cardinality
    sketch relation (bounded by the calendar, not the corpus). Binary
    sketches are not SQL-expressible => rows-only; the exact count rides
    in the same row and pytest bounds the relative error."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    days = daily.select(F.col("day").alias("anchor"))
    window7 = days.join(
        daily,
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
    )
    est = window7.groupBy("anchor").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("wau_hll"),
        F.count("*").cast("long").alias("n_days_in_window"),
    )
    exact = (
        e.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .join(days, (F.col("day") <= F.col("anchor"))
              & (F.col("day") >= F.date_sub(F.col("anchor"), 6)))
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").cast("long").alias("wau_exact"))
    )
    return (
        est.join(exact, "anchor")
        .select(
            F.col("anchor").cast("string").alias("day"),
            "wau_hll",
            "wau_exact",
            "n_days_in_window",
        )
    )
