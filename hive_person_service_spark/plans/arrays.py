"""Array long-tail (§2.H): explode_outer (LATERAL VIEW OUTER), the
higher-order function family, sequence generation, array set algebra.
Array-valued outputs are serialized to joined strings (registry rule: no
array output columns -- engine-stable hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare


@declare(
    "fn_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(long_toks) = 0 THEN [NULL] ELSE long_toks END)
             AS long_token
    FROM (SELECT doc_id,
                 list_filter(str_split(text, ' '), t -> length(t) >= 9) AS long_toks
          FROM documents WHERE doc_id < 100)
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer (Hive LATERAL VIEW OUTER explode): a row with an empty
    array survives as one NULL row instead of vanishing -- the oracle
    emulates it with a [NULL] substitution."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    long_toks = F.filter(tokens_expr(), lambda t: F.length(t) >= 9)
    return d.select("doc_id", F.explode_outer(long_toks).alias("long_token"))


@declare(
    "fn_higher_order",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(str_split(text, ' '), t -> upper(t)), ',')
             AS upper_tokens,
           coalesce(array_to_string(list_filter(str_split(text, ' '),
                                                t -> length(t) > 5), ','), '')
             AS long_tokens,
           CAST(list_aggregate(list_transform(str_split(text, ' '), t -> length(t)),
                               'sum') AS BIGINT) AS total_len,
           list_contains(str_split(text, ' '), 'spark') AS has_spark,
           len(list_filter(str_split(text, ' '), t -> length(t) = 0)) = 0
             AS all_nonempty
    FROM documents WHERE doc_id < 200
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function family: transform, filter, aggregate (fold),
    exists, forall -- all JVM lambda expressions inside codegen."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = tokens_expr()
    return d.select(
        "doc_id",
        F.array_join(F.transform(toks, F.upper), ",").alias("upper_tokens"),
        F.array_join(
            F.filter(toks, lambda t: F.length(t) > 5), ","
        ).alias("long_tokens"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
        )
        .cast("long")
        .alias("total_len"),
        F.exists(toks, lambda t: t == "spark").alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
    )


@declare(
    "fn_sequence",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_transform(range(1, l_linenumber + 1),
                                          i -> CAST(i AS VARCHAR)), ',') AS seq_str,
           CAST(l_linenumber AS BIGINT) AS seq_len
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence generation (1..n per row) -- the lateral-number-table
    primitive behind time-series densification and slot expansion."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(seq.cast("array<string>"), ",").alias("seq_str"),
        F.size(seq).cast("long").alias("seq_len"),
    )


@declare(
    "fn_array_setops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_ab,
           array_to_string(list_sort(list_filter(list_distinct(a),
                                                 x -> list_contains(b, x))), ',')
             AS intersect_ab,
           array_to_string(list_sort(list_filter(list_distinct(a),
                                                 x -> NOT list_contains(b, x))), ',')
             AS except_ab
    FROM (SELECT doc_id,
                 str_split(text, ' ')[1:10] AS a,
                 str_split(text, ' ')[6:15] AS b
          FROM documents WHERE doc_id < 100)
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union / intersect / except on token slices
    (sorted + serialized for stable comparison)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = tokens_expr()
    a = F.slice(toks, 1, 10)
    b = F.slice(toks, 6, 10)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_ab"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("intersect_ab"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("except_ab"),
    )
