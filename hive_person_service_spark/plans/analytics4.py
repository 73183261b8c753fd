"""Batch 8 — analytics/pipeline widening (round 2):

- sql_tpch_q8: national market share (the one TPC-H analog the suite was
  missing; q1-q22 now all covered).
- emb_centroid_distance: per-label centroid cosine via pure relational
  decomposition (posexplode -> avg per (label, dim) -> dot-product join) --
  the "vector op as a shuffle-friendly aggregation" pattern that needs no
  UDF and survives any corpus size.
- events_top_paths: top event-type trigram paths per user timeline (lead
  windows partitioned by user -- path mining without sessionizing).
- text_keywords: top-3 TF-IDF terms per document (vocab-sized DF join +
  per-doc top-k window -- WindowGroupLimit shape).
- text_containment: directional n-gram containment join (|A∩B|/|A| >= 0.8,
  the sub-document-duplication metric exact-Jaccard misses).
- docs_curriculum: curriculum ordering with fixed-width length buckets and
  per-bucket sequence (windows partition by bucket; at 100 TB the bucket
  cuts come from approxQuantile instead of constants -- never a global
  window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..functions.vectors import to_double_array
from ..sources import load_table
from .registry import declare


@declare(
    "sql_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) analog: NATION_1's share of PROMO
    part revenue sold into ASIA customers, by order year. The p_type and
    r_name filters reach the dim scans; both nation dims and region
    broadcast; the share division uses unrounded sums on both sides."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(p.where(F.col("p_type") == "PROMO")),
                li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume"))
                      .otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@declare(
    "emb_centroid_distance",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    flat AS (
      SELECT vec_id, label, unnest(v) AS val,
             unnest(generate_series(1, len(v))) AS pos
      FROM e),
    cent AS (SELECT label, pos, AVG(val) AS cval FROM flat GROUP BY label, pos),
    cnorm AS (SELECT label, SQRT(SUM(cval * cval)) AS cn FROM cent GROUP BY label),
    dots AS (
      SELECT f.vec_id, f.label, SUM(f.val * c.cval) AS dot
      FROM flat f JOIN cent c ON f.label = c.label AND f.pos = c.pos
      GROUP BY f.vec_id, f.label)
    SELECT d.vec_id, d.label, ROUND(d.dot / n.cn, 6) AS cos
    FROM dots d JOIN cnorm n ON d.label = n.label
    """,
)
def emb_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every embedding to its label centroid, fully relational:
    posexplode to (vec, label, dim, val), centroid = avg per (label, dim)
    (map-side partial agg), dot product = join on (label, dim) + sum.
    No UDF, no driver-side vectors; the centroid relation is labels x dims
    rows (tiny -> broadcast join), so the only corpus-sized shuffles key on
    (label, dim) and vec_id. The embedding-curation primitive behind
    outlier pruning and cluster-balance checks."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    flat = e.select("vec_id", "label", F.posexplode("v").alias("pos", "val"))
    cent = flat.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    dots = (
        flat.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("dot"))
    )
    return dots.join(F.broadcast(cnorm), "label").select(
        "vec_id", "label", F.round(F.col("dot") / F.col("cn"), 6).alias("cos")
    )


@declare(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type trigram paths across user timelines: lead windows
    partitioned by user (shuffle keys on user_id only; no sessionization
    needed for order-k path mining), concat, count, TakeOrdered top-20."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@declare(
    "text_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n),
    ranked AS (
      SELECT doc_id, w, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, w) AS rnk
      FROM scored)
    SELECT doc_id, w AS term, ROUND(tfidf, 6) AS tfidf,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document: term-frequency groupBy, the
    document-frequency relation joined back un-hinted (vocabulary grows
    with the corpus -- AQE broadcasts when it fits, shuffles when it
    doesn't), per-doc top-k window (WindowGroupLimit pushes the rank
    filter into the sort). The corpus total rides along as a broadcast
    1-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_expr()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("tf"))
    df = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "w")
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round("tfidf", 6).alias("tfidf"),
            "rnk",
        )
    )


@declare(
    "text_containment",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingle
      FROM tok WHERE len(t) >= 3),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT s.id_a, s.id_b,
           ROUND(CAST(s.shared AS DOUBLE) / na.ns, 6) AS containment
    FROM shared s JOIN n na ON s.id_a = na.doc_id
    WHERE CAST(s.shared AS DOUBLE) / na.ns >= 0.8
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment join: C(A->B) = |A ∩ B| / |A| >= 0.8
    -- catches sub-document duplication (A embedded in a larger B) that
    symmetric Jaccard dilutes below threshold. Candidates meet through the
    shingle inverted index (shared-shingle equi-join, never a cross join);
    only the per-pair count and the |A| relation join after."""
    from ..operators.dedup import doc_shingles

    d = load_table(spark, sf_dir, "documents")
    # The .distinct() is value-wise redundant (doc_shingles dedupes in-row
    # via array_distinct) but kept DELIBERATELY: its Exchange+Aggregate is
    # an identical subtree under all three consumers (|A| counts + both
    # self-join sides), so ReuseExchange computes the shingling once and
    # shares the shuffle output -- measured at sf0.1 (interleaved
    # best-of-4, r11 opt round): 3.4s as-is vs 4.8s with .persist()
    # instead vs 6.8s with neither. A free materialization point.
    sh = doc_shingles(d, n=3).distinct()
    n = sh.groupBy("doc_id").agg(F.count("*").alias("ns"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    na = n.select(F.col("doc_id").alias("id_a"), F.col("ns").alias("na"))
    cont = F.col("shared").cast("double") / F.col("na")
    return (
        shared.join(na, "id_a")
        .where(cont >= 0.8)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


@declare(
    "docs_curriculum",
    oracle="""
    SELECT doc_id,
           CAST(LEAST(n_chars // 64, 8) AS BIGINT) AS bucket,
           CAST(row_number() OVER (
                  PARTITION BY LEAST(n_chars // 64, 8)
                  ORDER BY n_chars, doc_id) AS BIGINT) AS pos
    FROM documents
    """,
)
def docs_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum (easy-to-hard) training order: fixed-width length buckets
    (64-char strides, capped -- fixture n_chars spans 47..558), then a
    deterministic sequence within each bucket. Windows partition by bucket,
    never globally; a 100 TB run derives the cuts from approxQuantile and
    writes one file set per bucket so downstream loaders stream buckets in
    order."""
    from ..operators.global_rank import with_grouped_row_number

    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / F.lit(64)), F.lit(8)).cast("long")
    # ~9 buckets over the whole corpus: per-bucket sequence via the
    # grouped two-phase rank, not a 9-task partitioned window.
    return with_grouped_row_number(
        d.select("doc_id", "n_chars", bucket.alias("bucket")),
        ["bucket"],
        [F.col("n_chars"), F.col("doc_id")],
        out="pos",
    ).select("doc_id", "bucket", "pos")
