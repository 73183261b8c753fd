"""Coverage extras: PIVOT, null-safe equality join, string_agg,
regexp_extract_all, TABLESAMPLE -- the long tail of the HiveQL surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@declare(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
           SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
           SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
           SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long -> wide): event counts per user, one column per type.
    Values are enumerated explicitly -- at scale an un-enumerated pivot
    needs a driver-side distinct pass first (two jobs)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
    )
    # pivot yields NULL for absent combos; the CASE-SUM oracle yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@declare(
    "join_null_safe",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM (SELECT s_suppkey, nullif(s_nationkey, 0) AS k FROM supplier) s
    JOIN (SELECT c_custkey, nullif(c_nationkey, 0) AS k FROM customer
          WHERE c_custkey < 300) c
      ON s.k IS NOT DISTINCT FROM c.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other, unlike plain equi-join semantics."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(0)).alias("k")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", F.nullif(F.col("c_nationkey"), F.lit(0)).alias("k"))
    )
    return s.join(c, s["k"].eqNullSafe(c["k"])).select("s_suppkey", "c_custkey")


@declare(
    "agg_string_agg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, '|' ORDER BY c_name) AS names,
           COUNT(*) AS n
    FROM customer WHERE c_custkey < 60 GROUP BY c_mktsegment
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (Hive collect_list+concat_ws, SQL LISTAGG):
    deterministic via sorted collect."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 60)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias("names"),
        F.count("*").alias("n"),
    )


@declare(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + global regexp_replace (pattern-function tail)."""
    p = load_table(spark, sf_dir, "part")
    # Spark's regexp_extract_all extracts capture group 1 by default (and
    # requires the group to exist); DuckDB's extracts the full match --
    # ([a-z]+) makes them identical.
    allw = F.regexp_extract_all("p_name", F.lit("([a-z]+)"))
    return p.select(
        "p_partkey",
        F.array_join(allw, ",").alias("words"),
        F.size(allw).cast("long").alias("n_words"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@declare("sample_rows", oracle=None)  # rows-only: sampling is engine-specific
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE analog: seeded Bernoulli sample (deterministic per seed +
    partitioning -- pytest pins reproducibility). At scale this is the
    standard cheap-stats / debugging scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
