"""Pipeline batch 7 -- web-corpus identity + sampling (all oracle-checked):

- dedup_url_normalize: URL canonicalization dedup, the FIRST dedup pass of
  every web-crawl pipeline (cheaper than any content hash): lowercase
  scheme+host, strip fragments and utm_* tracking params, then group by
  canonical URL keeping the lowest doc_id. Messy variants are synthesized
  deterministically (case-flipped hosts, tracking params, fragments) so
  real collisions exist at every SF.
- sample_reservoir_grouped: deterministic fixed-k per-group sample -- the
  reproducible stand-in for reservoir sampling: rank by md5(lang:doc_id)
  within each language, keep k. Same sample every run, every engine, any
  partitioning -- which a true random reservoir cannot promise; the rank
  window is per-group (bounded) and rank<=k pushes down to WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

RESERVOIR_K = 10

# Deterministic messy-URL synthesis: host case flips by parity, path
# collides via doc_id % 250, tracking params + fragment vary.
_URL_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' || upper(source) ELSE"
    " 'https://' || source END || '.Example.COM/doc/'"
    " || CAST(doc_id % 250 AS VARCHAR)"
    " || '?utm_source=feed' || CAST(doc_id % 7 AS VARCHAR)"
    " || '&id=' || CAST(doc_id % 250 AS VARCHAR)"
    " || CASE WHEN doc_id % 3 = 0 THEN '#sec' || CAST(doc_id % 5 AS VARCHAR)"
    " ELSE '' END"
)

# Canonicalization steps (identical regexps both engines):
#   1. strip #fragment;  2. lowercase the scheme://host prefix;
#   3. drop utm_* params;  4. tidy dangling '?'/'&' separators.
_STRIP_FRAG = "#.*$"
_UTM = "utm_[a-z]+=[^&#]*&?"
_DANGLING = "[?&]$"


@declare(
    "dedup_url_normalize",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               lower(regexp_extract(nofrag, '^([^/]*//[^/]+)', 1))
                 || regexp_replace(
                      regexp_replace(nofrag, '^[^/]*//[^/]+', ''),
                      '{_UTM}', ''),
               '{_DANGLING}', '') AS curl
      FROM (SELECT doc_id, regexp_replace(url, '{_STRIP_FRAG}', '') AS nofrag
            FROM raw))
    SELECT curl, CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id
    FROM canon GROUP BY curl
    """,
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: normalize scheme/host case, strip
    fragments + utm_* params, group by canonical form keeping the lowest
    doc_id. One map pass + one groupBy on the canonical key -- at crawl
    scale this collapses the URL space before any content-hash pass runs."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.concat(F.lit("HTTPS://"), F.upper("source")))
        .otherwise(F.concat(F.lit("https://"), F.col("source"))),
        F.lit(".Example.COM/doc/"),
        (did % 250).cast("string"),
        F.lit("?utm_source=feed"),
        (did % 7).cast("string"),
        F.lit("&id="),
        (did % 250).cast("string"),
        F.when(
            did % 3 == 0, F.concat(F.lit("#sec"), (did % 5).cast("string"))
        ).otherwise(F.lit("")),
    )
    nofrag = F.regexp_replace(url, _STRIP_FRAG, "")
    host = F.lower(F.regexp_extract(nofrag, "^([^/]*//[^/]+)", 1))
    rest = F.regexp_replace(
        F.regexp_replace(nofrag, "^[^/]*//[^/]+", ""), _UTM, ""
    )
    curl = F.regexp_replace(F.concat(host, rest), _DANGLING, "")
    return (
        d.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("survivor_id"),
        )
    )


@declare(
    "sample_reservoir_grouped",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= {RESERVOIR_K}
    """,
)
def sample_reservoir_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language k-sample (reproducible reservoir): rank
    by md5(lang:doc_id) inside each language, keep k=10. rank<=k compiles
    to WindowGroupLimit (per-partition top-k pre-filter before the window
    shuffle), so each group ships at most k rows -- group count x k output
    regardless of corpus size, and the same sample on any engine or run."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")))
    rk = F.row_number().over(Window.partitionBy("lang").orderBy(key, "doc_id"))
    return (
        d.select("doc_id", "lang", rk.cast("long").alias("rk"))
        .where(F.col("rk") <= RESERVOIR_K)
    )
