"""Round-4 continuation batch 33: sketch set algebra, SQL-defined
functions, parameterized SQL, experiment analysis, survival curves,
decoded-image statistics, bigram language model.

- sketch_theta_intersection: theta-sketch INTERSECTION over KMV sketches
  — the mergeable-sketch algebra (union was sketch_kmv_daily_merge) that
  answers "how many users did BOTH X and Y" from two k-sized summaries
  instead of a user-level join; fully oracle-checked because the repo's
  KMV idiom is md5-hex string order + instr arithmetic, not opaque blobs.
- sql_create_function / sql_parameterized: the Hive CREATE FUNCTION and
  parameterized-statement surfaces on Spark 4 (SQL-body scalar UDF, SQL
  table function, named :param markers).
- events_ab_ztest: two-proportion z-test between hash-split cohorts —
  the experiment-analysis primitive; deterministic split, exact
  arithmetic, IEEE sqrt agrees bit-for-bit across engines.
- orders_survival_km: Kaplan-Meier survival of order→first-shipment
  delay via exp(sum(ln(1 - d/n))) over the compacted per-day event
  relation — product aggregation without a product aggregate.
- multimodal_pixel_stats: per-image statistics computed from DECODED
  pixels (PGM/BMP/PNG rotating containers) vs a purely arithmetic
  oracle — the feature-extraction stage after decode.
- text_bigram_logprob: conditional bigram LM score (the unigram filter's
  stronger sibling) with the same DECIMAL-quanta / FLOOR-mean
  scale-invariance discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline17 import KMV_K, _frac_expr
from .registry import declare


@declare(
    "sketch_theta_intersection",
    oracle=f"""
    WITH hex AS (SELECT '0123456789abcdef' AS s),
    au AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
           FROM events WHERE event_type = 'purchase'),
    bu AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
           FROM events WHERE event_type = 'click'),
    ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM au)
           WHERE rn <= {KMV_K}),
    kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM bu)
           WHERE rn <= {KMV_K}),
    fr AS (SELECT
        (SELECT CASE WHEN COUNT(*) = {KMV_K} THEN (
            SELECT SUM((instr((SELECT s FROM hex), substr(mh, i, 1)) - 1)
                       / power(16, i))
            FROM generate_series(1, 8) g(i),
                 (SELECT MAX(h) AS mh FROM ka))
          ELSE 1.0 END FROM ka) AS ta,
        (SELECT CASE WHEN COUNT(*) = {KMV_K} THEN (
            SELECT SUM((instr((SELECT s FROM hex), substr(mh, i, 1)) - 1)
                       / power(16, i))
            FROM generate_series(1, 8) g(i),
                 (SELECT MAX(h) AS mh FROM kb))
          ELSE 1.0 END FROM kb) AS tb),
    theta AS (SELECT LEAST(ta, tb) AS t FROM fr),
    shared AS (
      SELECT ka.h FROM ka JOIN kb USING (h)
      WHERE (SELECT SUM((instr((SELECT s FROM hex), substr(ka.h, i, 1)) - 1)
                        / power(16, i)) FROM generate_series(1, 8) g(i))
            < (SELECT t FROM theta)),
    exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT h FROM au INTERSECT SELECT h FROM bu))
    SELECT CAST((SELECT COUNT(*) FROM shared) AS BIGINT) AS shared_in_theta,
           ROUND((SELECT COUNT(*) FROM shared) / (SELECT t FROM theta), 2)
             AS est_intersection,
           (SELECT n FROM exact) AS exact_intersection
    """,
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set INTERSECTION from two KMV sketches: per event
    type keep only the k smallest md5 hashes of its user set; theta =
    min of the two kth-hash fractions (1.0 for an exhaustive sketch);
    the estimate is |shared hashes below theta| / theta. This is the
    sketch algebra that answers audience-overlap questions ("did both
    purchase AND click") from two 64-row summaries — at 100 TB the
    sketches are per-day/per-segment rollup rows merged associatively,
    never a user-level join. The md5-hex/instr idiom keeps the WHOLE
    lifecycle oracle-checked (build, theta, intersect, estimate), and
    the exact intersection rides along so the estimate's error is
    visible in the result."""
    e = load_table(spark, sf_dir, "events")

    def kmv(event_type: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == event_type)
            .select(F.md5(F.col("user_id").cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    ka, kb = kmv("purchase"), kmv("click")

    def theta_of(kmv_df: DataFrame):
        return kmv_df.agg(
            F.when(F.count("*") == KMV_K, _frac_expr(F.max("h")))
            .otherwise(F.lit(1.0))
            .alias("t")
        )

    fr = (
        theta_of(ka)
        .select(F.col("t").alias("ta"))
        .crossJoin(theta_of(kb).select(F.col("t").alias("tb")))
        .select(F.least("ta", "tb").alias("t"))
    )
    shared = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(fr))
        .where(_frac_expr(F.col("h")) < F.col("t"))
    )
    au = (
        e.where(F.col("event_type") == "purchase")
        .select(F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    bu = (
        e.where(F.col("event_type") == "click")
        .select(F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    exact = au.intersect(bu).agg(F.count("*").cast("long").alias("n"))
    # Aggregate the shared count FIRST (a global agg over zero rows still
    # yields one row with count 0), then attach theta from the broadcast
    # 1-row relation — so the no-overlap edge case estimates 0/theta = 0.0
    # instead of count/first(NULL) = NULL.
    return (
        shared.agg(F.count("*").cast("long").alias("shared_in_theta"))
        .crossJoin(F.broadcast(fr.select(F.col("t").alias("theta"))))
        .select(
            "shared_in_theta",
            F.round(F.col("shared_in_theta") / F.col("theta"), 2).alias(
                "est_intersection"
            ),
        )
        .crossJoin(F.broadcast(exact.select(F.col("n").alias("exact_intersection"))))
    )


@declare(
    "sql_create_function",
    oracle="""
    WITH buckets AS (SELECT b, 100000.0 * b AS lo, 100000.0 * (b + 1) AS hi
                     FROM generate_series(0, 5) g(b))
    SELECT CASE WHEN o_totalprice < 0 THEN 'neg'
                WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'large' END AS tier,
           CAST(b.b AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 0.9 * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS discounted_total
    FROM orders o JOIN buckets b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1, 2
    """,
)
def sql_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CREATE FUNCTION parity on Spark 4's SQL-body UDFs: a scalar
    SQL UDF (price tier), a second scalar UDF used inside an aggregate
    (discount), and a SQL TABLE function (bucket edges) joined as a
    relation — all defined in pure SQL, catalog-registered, zero Python
    in the data path (the body inlines into the plan at resolution, so
    whole-stage codegen sees plain expressions; this is the fast-path
    answer to row-at-a-time Hive GenericUDFs). The oracle inlines the
    same logic, proving definition and call sites resolve identically."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_fn_orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 0 THEN 'neg'
                    WHEN p < 100000 THEN 'small'
                    WHEN p < 300000 THEN 'mid'
                    ELSE 'large' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION apply_discount(p DOUBLE)
        RETURNS DOUBLE RETURN p * 0.9
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_buckets(width DOUBLE, n INT)
        RETURNS TABLE(b INT, lo DOUBLE, hi DOUBLE)
        RETURN SELECT i, width * i, width * (i + 1)
               FROM (SELECT explode(sequence(0, n - 1)) AS i)
        """
    )
    return spark.sql(
        """
        SELECT price_tier(o_totalprice) AS tier,
               b.b AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(apply_discount(o_totalprice) * 100)
                             AS BIGINT)) AS DOUBLE) / 100.0
                   AS discounted_total
        FROM _fn_orders o JOIN price_buckets(100000.0, 6) b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY 1, 2
        """
    )


@declare(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice >= 150000 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named :param markers bound server-side, Spark
    3.4+): the injection-safe prepared-statement surface a service layer
    uses instead of string interpolation — parameters are bound as typed
    literals AFTER parsing, so a hostile string can never alter the plan
    shape, and Catalyst still constant-folds them (the filter reaches
    the parquet scan as a pushed predicate exactly like a literal). The
    oracle inlines the same values."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM _param_orders
        WHERE o_totalprice >= :min_total AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_total": 150000, "status": "F"},
    )


@declare(
    "events_ab_ztest",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 95
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    agg AS (
      SELECT
        SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS conv_a,
        SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS conv_b
      FROM cohort)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM agg
    """,
)
def events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: two-proportion z-test between A/B cohorts.
    Assignment is the deterministic user_id hash split a real experiment
    platform uses (stable across sessions/devices — never rand()), the
    outcome is per-user HIGH-VALUE purchase conversion (value >= 95 —
    plain any-purchase saturates to rate 1.0 in this fixture, making
    the pooled variance 0), and the statistic is the pooled-variance z. Two hash aggregations (user-grain then global);
    every arithmetic step is exact IEEE ops + correctly-rounded sqrt, so
    both engines produce identical doubles before the display rounding.
    At 100 TB the user-grain aggregate is the only shuffle and it
    partial-aggregates map-side."""
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 95), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "converted")
    agg = cohort.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pooled = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(
        pooled * (1 - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


@declare(
    "orders_survival_km",
    oracle="""
    WITH dur AS (
      SELECT o.o_orderkey,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(MIN(l.l_shipdate) AS DATE)) AS t
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    dur_f AS (SELECT t FROM dur WHERE t >= 0),
    ev AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d FROM dur_f GROUP BY t),
    risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM dur_f) - COALESCE(SUM(d) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM ev),
    km AS (
      SELECT t, d, n_risk,
             exp(SUM(ln(1 - CAST(d AS DOUBLE) / n_risk)) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS s
      FROM risk WHERE d < n_risk)
    SELECT CAST(t AS BIGINT) AS t_days, d AS n_events,
           CAST(n_risk AS BIGINT) AS n_risk, ROUND(s, 6) AS survival
    FROM km
    """,
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of order -> first shipment delay: per
    distinct delay t, the at-risk count n_t (orders not yet shipped
    before t) and S(t) = prod(1 - d/n) computed as exp(sum(ln)) — the
    product-over-ordered-groups aggregation neither engine has a
    product() window for. The fact table collapses to one row per
    distinct day FIRST (bounded by the date range, not order count), so
    the partition-less cumulative window runs over a metadata-sized
    relation — the repo's few-groups discipline. The terminal point
    where d = n (survival exactly 0, ln(0) diverges cross-engine) is
    excluded by construction. The synthetic fixture draws ship dates
    independently of order dates, so the curve runs over the
    causally-ordered subset (t >= 0) — on real data that filter is a
    data-quality gate, not a semantic change."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate")).alias("t")
        )
        .where(F.col("t") >= 0)
    )
    total = dur.count()  # scalar: one number, the only driver value
    ev = dur.groupBy("t").agg(F.count("*").cast("long").alias("d"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = ev.withColumn(
        "n_risk", F.lit(total) - F.coalesce(F.sum("d").over(w_prev), F.lit(0))
    ).where(F.col("d") < F.col("n_risk"))
    km = risk.withColumn(
        "s",
        F.exp(
            F.sum(F.log(1 - F.col("d").cast("double") / F.col("n_risk"))).over(w_run)
        ),
    )
    return km.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round("s", 6).alias("survival"),
    )


@declare(
    "multimodal_pixel_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 16 + doc_id % 8 AS w, 16 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 4 = 0),
    px AS (
      -- DuckDB 1.0 can't lateral-correlate generate_series on a column:
      -- enumerate the max 23x20 grid and filter to each image's dims.
      SELECT asset_id, (3 * gx.x + 7 * gy.y + asset_id) % 256 AS v
      FROM ids
      CROSS JOIN (SELECT unnest(generate_series(0, 22)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS y) gy
      WHERE gx.x < w AND gy.y < h)
    SELECT asset_id,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS psum,
           CAST(MIN(v) AS BIGINT) AS vmin,
           CAST(MAX(v) AS BIGINT) AS vmax,
           CAST(SUM(CASE WHEN v < 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_dark
    FROM px GROUP BY asset_id
    """,
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-decode feature extraction: per-image pixel statistics (count,
    sum, min/max, dark-pixel count) computed from DECODED blobs — the
    containers rotate PGM / BMP / PNG by id, so the arithmetic oracle
    re-derives the stats from the pixel formula and a match proves all
    three decode paths byte-exactly, this time over FULL original images
    (multimodal_decode_resize checks the resized 8x8). Arrow-batched
    numpy per image, integer outputs only — no float drift possible.
    The id%4 slice bounds the Python-side work at every sf; at 100 TB
    the same mapInPandas shape streams per-batch with constant memory."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    from ..operators.multimodal import decode_image, synth_encoded_images

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select(F.col("doc_id").alias("asset_id"))
    )
    assets = synth_encoded_images(d)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_px", LongType()),
            StructField("psum", LongType()),
            StructField("vmin", LongType()),
            StructField("vmax", LongType()),
            StructField("n_dark", LongType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
                px = decode_image(bytes(blob)).astype(np.int64)
                out.append(
                    (
                        int(aid),
                        int(px.size),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int((px < 128).sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "n_px", "psum", "vmin", "vmax", "n_dark"]
            )

    return assets.mapInPandas(stats, schema)


@declare(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS ts
      FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i + 1])) AS bg
      FROM toks WHERE len(ts) >= 2),
    counts AS (SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY bg),
    heads AS (
      SELECT string_split(bg, ' ')[1] AS w1, SUM(c12) AS c1
      FROM counts GROUP BY 1),
    model AS (
      SELECT bg, ROUND(ln(CAST(c12 AS DOUBLE) / c1), 6) AS logp
      FROM counts JOIN heads ON string_split(bg, ' ')[1] = heads.w1),
    scored AS (
      SELECT b.doc_id,
             FLOOR(10000.0 * CAST(SUM(CAST(m.logp AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*)) / 10000.0 AS mean_logp,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams
      FROM bi b JOIN model m USING (bg) GROUP BY b.doc_id)
    SELECT doc_id, mean_logp, n_bigrams FROM scored
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram LM quality score: train corpus bigram counts,
    condition on the head token (logp = ln(c(w1 w2) / c(w1 ·))), score
    each document by its mean bigram log-probability — the stronger
    perplexity proxy that penalizes unusual token ORDER, not just rare
    tokens (text_unigram_logprob's blind spot: shuffled text scores
    identically there). Same scale-invariance discipline as the unigram
    query — 6-decimal logp quanta accumulated as DECIMAL(18,6), mean
    emitted via FLOOR (no .5-tie semantics) — so the score is
    bit-identical at every sf. The model join is un-hinted: distinct
    bigram types grow near-linearly with corpus size, so the join
    strategy stays a planner decision (AQE broadcasts when the model
    fits, shuffles on bg when it doesn't)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ts"),
    )
    bi = (
        toks.where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    counts = bi.groupBy("bg").agg(F.count("*").alias("c12"))
    heads = (
        counts.groupBy(F.split("bg", " ")[0].alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    model = counts.join(
        heads, F.split(counts.bg, " ")[0] == heads.w1
    ).select(
        "bg",
        F.round(F.log(F.col("c12").cast("double") / F.col("c1")), 6).alias("logp"),
    )
    return (
        bi.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            (
                F.floor(
                    F.lit(10000.0)
                    * F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
                    / F.count("*")
                )
                / 10000.0
            ).alias("mean_logp"),
            F.count("*").cast("long").alias("n_bigrams"),
        )
    )
