"""Round-4 continuation batch 35: URL parsing, map higher-order algebra,
XML ingest, native datasketches HLL, and the composed dedup cascade.

- fn_url_parse: Hive/Spark parse_url over synthesized URLs (HOST / PATH /
  QUERY-param extraction) — the web-log column surface; DuckDB lacks
  parse_url, so the oracle re-derives each part with regexes, proving the
  semantics rather than echoing the function.
- fn_map_higher_order: map_from_entries / map_zip_with /
  transform_values / explode-over-map — the MAP-typed algebra (Hive MAP
  columns) beyond the basic fn_map family.
- fn_xml_parse: from_xml (Spark 4) over synthesized XML payloads — the
  third semi-structured ingest format next to JSON and VARIANT.
- sketch_hll_native: Spark's built-in Apache DataSketches HLL
  (hll_sketch_agg / hll_union_agg / hll_sketch_estimate) — the
  production mergeable-sketch tier; binary sketches are not
  SQL-expressible in DuckDB => rows-only, with error-bound and
  merge-associativity pytests.
- dedup_cascade_report: the dedup stages COMPOSED as one pipeline
  (exact hash-dedup, then exact 3-gram Jaccard near-dup over the
  survivors) with a per-stage impact report — the end-to-end corpus
  cleaning job, fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import doc_shingles
from ..sources import load_table
from .registry import declare


@declare(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
      SELECT c_custkey,
             'https://shop.example.com/' || lower(c_mktsegment) || '/c'
               || CAST(c_custkey AS VARCHAR) || '?ref=email&bal='
               -- FLOOR, not CAST: Spark's double->long cast truncates
               -- where DuckDB's rounds; floor agrees everywhere.
               || CAST(CAST(FLOOR(c_acctbal) AS BIGINT) AS VARCHAR) AS url
      FROM customer WHERE c_custkey < 300)
    SELECT c_custkey,
           regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]bal=([^&#]*)', 1) AS bal_param
    FROM urls
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url (a HiveQL original Spark kept): HOST / PATH / per-key
    QUERY extraction from URL columns — the first projection every
    web-log or crawl pipeline runs (and the input to the URL-normalize
    dedup stage). Pure codegen expressions. DuckDB has no parse_url, so
    the oracle re-implements each part with regexes — agreement checks
    the SEMANTICS (authority ends at : / ? #, query params split on &)
    instead of round-tripping one engine's quirk."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.lower("c_mktsegment"),
        F.lit("/c"),
        F.col("c_custkey").cast("string"),
        F.lit("?ref=email&bal="),
        F.floor("c_acctbal").cast("long").cast("string"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("bal")).alias("bal_param"),
    )


@declare(
    "fn_map_higher_order",
    oracle="""
    WITH halves AS (
      SELECT user_id, event_type,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
                  THEN 'h1' ELSE 'h2' END AS half,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3)
    SELECT user_id, event_type,
           CAST(2 * COALESCE(SUM(CASE WHEN half = 'h1' THEN n END), 0)
                + COALESCE(SUM(CASE WHEN half = 'h2' THEN n END), 0) AS BIGINT)
             AS weighted_n
    FROM halves GROUP BY 1, 2
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed algebra (Hive MAP columns): per user, build one
    type->count MAP per month half with map_from_entries, combine the
    two maps key-wise with map_zip_with (2x weight on the early half),
    then explode the merged map back to rows. The oracle never touches a
    map — it recomputes the weighted counts relationally — so agreement
    proves the map round-trip (build, zip with missing-key NULL
    handling, explode) loses nothing. All JVM higher-order functions;
    per-user maps are 5-entry bounded at any scale."""
    e = load_table(spark, sf_dir, "events")
    halves = e.groupBy(
        "user_id",
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-15").cast("timestamp"), "h1")
        .otherwise("h2")
        .alias("half"),
    ).agg(F.count("*").alias("n"))
    maps = (
        halves.groupBy("user_id")
        .pivot("half", ["h1", "h2"])
        .agg(F.map_from_entries(F.collect_list(F.struct("event_type", "n"))))
    )
    merged = maps.select(
        "user_id",
        F.map_zip_with(
            F.coalesce("h1", F.expr("map()")),
            F.coalesce("h2", F.expr("map()")),
            lambda k, v1, v2: 2 * F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
        ).alias("weighted"),
    )
    return merged.select(
        "user_id", F.explode("weighted").alias("event_type", "weighted_n")
    ).select("user_id", "event_type", F.col("weighted_n").cast("long").alias("weighted_n"))


@declare(
    "fn_xml_parse",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest (Spark 4 from_xml): each order serialized to an XML
    payload, parsed back through a declared schema, aggregated — the
    legacy-B2B-feed path next to JSON (fn_json_props) and VARIANT
    (fn_variant_json). The oracle aggregates the relational source, so
    agreement proves escaping and typed extraction round-trip every row
    (keys, doubles, strings). Synthesize->parse keeps the query
    self-contained the way the format round-trip queries are; the parse
    is JVM-side StaxXmlParser, no Python."""
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<order><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.col("o_totalprice").cast("string"),
        F.lit("</p><s>"),
        F.col("o_orderstatus"),
        F.lit("</s></order>"),
    )
    parsed = o.select(
        F.from_xml(xml, "k BIGINT, p DOUBLE, s STRING").alias("x")
    ).select(
        F.col("x.k").alias("o_orderkey"),
        F.col("x.p").alias("o_totalprice"),
        F.col("x.s").alias("o_orderstatus"),
    )
    return parsed.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@declare("sketch_hll_native", oracle=None)  # rows-only: binary sketches
def sketch_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION mergeable-sketch tier: Spark's built-in Apache
    DataSketches HLL — per event type build an hll_sketch_agg over
    user_id, merge all types with hll_union_agg, estimate both levels.
    This is what replaces the repo's md5-string KMV teaching tier at
    real scale: binary sketches, JVM-side, constant size, associative
    merge (the daily-rollup->monthly-union lifecycle). The sketch bytes
    are not DuckDB-expressible => rows-only; tests pin the estimates
    within HLL error of exact counts and the union's associativity.
    The exact distinct count rides along per row so drift is visible."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").alias("hll_users"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )
    union = (
        e.groupBy("event_type")
        .agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("hll_users")
        )
        .crossJoin(
            e.agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
        )
        .select(F.lit("ALL(union)").alias("event_type"), "hll_users", "exact_users")
    )
    return per_type.unionByName(union)


@declare(
    "dedup_cascade_report",
    oracle="""
    WITH exact_kept AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1),
    tok AS (SELECT doc_id, str_split(text, ' ') AS tokens FROM exact_kept),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(tokens[i:i+2], ' ')
                     FOR i IN range(1, greatest(len(tokens) - 1, 1))]) AS shingle
      FROM tok),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    near_dropped AS (
      SELECT DISTINCT id_b AS doc_id
      FROM pairs JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.5)
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM exact_kept) AS BIGINT) AS n_exact_dropped,
           CAST((SELECT COUNT(*) FROM near_dropped) AS BIGINT) AS n_near_dropped,
           CAST((SELECT COUNT(*) FROM exact_kept)
                - (SELECT COUNT(*) FROM near_dropped) AS BIGINT) AS n_final
    """,
)
def dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup stages COMPOSED end-to-end, with the impact report a
    corpus-cleaning job emits: stage 1 exact dedup (keep lowest doc_id
    per identical text), stage 2 exact word-3-gram Jaccard >= 0.5
    near-dup over the SURVIVORS ONLY (candidates meet through the
    shared-shingle inverted-index join — cascading cheap-before-
    expensive is the point: stage 2's pair join never sees rows stage 1
    already killed), survivor policy keep-lowest-id. One row out:
    input / dropped-per-stage / final. Every stage is deterministic
    relational algebra, so the WHOLE cascade is oracle-checked — the
    composition proof on top of the per-stage queries (dedup_exact,
    dedup_ngram_jaccard)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    exact_kept = (
        d.select("doc_id", "text", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    from ..operators.caching import persist_bounded

    sh = persist_bounded("dedup_twostage_sh", doc_shingles(exact_kept, n=3))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    ca = cnt.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    near_dropped = (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .where(
            F.col("shared").cast("double")
            / (F.col("na") + F.col("nb") - F.col("shared"))
            >= 0.5
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    n_input = d.agg(F.count("*").cast("long").alias("n_input"))
    n_kept = exact_kept.agg(F.count("*").cast("long").alias("n_kept"))
    n_near = near_dropped.agg(F.count("*").cast("long").alias("n_near"))
    out = (
        n_input.crossJoin(n_kept)
        .crossJoin(n_near)
        .select(
            "n_input",
            (F.col("n_input") - F.col("n_kept")).cast("long").alias("n_exact_dropped"),
            F.col("n_near").cast("long").alias("n_near_dropped"),
            (F.col("n_kept") - F.col("n_near")).cast("long").alias("n_final"),
        )
    )
    return out
