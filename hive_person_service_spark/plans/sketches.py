"""Declared queries for the deterministic sketches (operators/sketches.py):
count-min frequency estimates and KMV distinct counts over document bigrams.
Both are FULLY oracle-checked -- the md5-derived hashing makes the sketch
state itself engine-reproducible, unlike HLL/GK (rows-only elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_build, cms_probe, kmv_ndv
from ..sources import load_table
from .registry import declare

# Probe set for the CMS: frequent bigrams, rarer ones, and one absent from
# the corpus (est must be 0 unless every seed's bucket collides).
_CMS_PROBES = [
    "table scan",
    "data query",
    "fast slow",
    "window merge",
    "spark join",
    "batch stream",
    "hash value",
    "group order",
    "missing pair",
]

_BIGRAMS_SQL = """
    SELECT lang,
           unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i + 1])) AS g
    FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
"""


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    return docs.select("lang", F.explode(grams).alias("g"))


@declare(
    "sketch_cms_freq",
    oracle=f"""
    WITH grams AS ({_BIGRAMS_SQL}),
    seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
    cms AS (
      SELECT seed,
             ('0x' || substr(md5(g), 1 + 8 * seed, 8))::UBIGINT % 1024
                 AS bucket,
             COUNT(*) AS cnt
      FROM grams, seeds GROUP BY 1, 2),
    cand(item) AS (VALUES {", ".join(f"('{p}')" for p in _CMS_PROBES)}),
    pb AS (
      SELECT item, seed,
             ('0x' || substr(md5(item), 1 + 8 * seed, 8))::UBIGINT % 1024
                 AS bucket
      FROM cand, seeds)
    SELECT item, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_est
    FROM pb LEFT JOIN cms USING (seed, bucket)
    GROUP BY item
    """,
)
def sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for candidate bigrams over the corpus
    (d=4, w=1024). The sketch is one grouped pass emitting <=4096 cells;
    probing is a broadcast join of a 9-row candidate list. est >= exact
    always (pytest-pinned vs exact counts); the deliberately-absent probe
    returns 0. Because buckets derive from md5, the whole sketch hash-matches
    DuckDB -- the estimates, including collision overcounts, are
    deterministic engine-independent values. The d hash rows are disjoint
    32-bit lanes of ONE md5 per item (not d salted digests): ~20% faster
    on the 2.2M-bigram stream (5.1s -> 4.3s warm; explode + shuffle
    dominate the remainder) with the same collision behavior."""
    grams = _bigrams(spark, sf_dir)
    cms = cms_build(grams, "g")
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], ["item"])
    return cms_probe(cms, probes, "item")


@declare(
    "sketch_kmv_ndv",
    oracle=f"""
    WITH bg AS (SELECT DISTINCT lang, g FROM ({_BIGRAMS_SQL})),
    hv AS (SELECT lang, g,
                  ('0x' || substr(md5(g), 1, 8))::UBIGINT AS h FROM bg),
    rk AS (SELECT lang, h,
                  row_number() OVER (PARTITION BY lang ORDER BY h, g) AS rn
           FROM hv),
    est AS (SELECT lang, ROUND(63.0 * 4294967296.0 / h, 4) AS kmv_est
            FROM rk WHERE rn = 64),
    ex AS (SELECT lang, COUNT(DISTINCT g) AS exact_ndv FROM bg GROUP BY lang)
    SELECT lang, kmv_est, exact_ndv FROM est JOIN ex USING (lang)
    """,
)
def sketch_kmv_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-bigram estimate per language (k=64), with the exact NDV
    alongside for calibration (pytest pins the relative error < 35%). The
    estimate path keeps k values per group -- at 100 TB the sketch is
    k * n_groups rows however large the corpus -- and merges with new data
    by min-union, unlike exact COUNT(DISTINCT) whose state is the distinct
    set itself."""
    bg = _bigrams(spark, sf_dir)
    est = kmv_ndv(bg, "g", "lang", k=64)
    exact = bg.distinct().groupBy("lang").agg(
        F.countDistinct("g").alias("exact_ndv")
    )
    return est.join(exact, "lang").select("lang", "kmv_est", "exact_ndv")
