"""§2.F/2.G -- global sort, limit/top-k, per-partition sort & distribution,
set operations.

Scale notes: ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
top-N, no total range-partitioned sort). Set ops are hash-based with partial
dedup; UNION ALL is a zero-shuffle concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "sort_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 1000
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort + limit (deterministic tie-break on the
    unique (l_orderkey, l_linenumber) pair)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(1000)
    )


@declare(
    "sort_limit_topk",
    oracle="""
    SELECT * FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE q_sort_limit shape: full-width top-100 via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    ).limit(100)


@declare("sort_within_partitions", oracle=None)  # rows-only: layout not SQL-visible
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive DISTRIBUTE BY + SORT BY: repartition on the key, sort inside each
    partition (no global order). Row *set* equals the input -- the driver's
    rows-only check covers it; pytest asserts the per-partition ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .repartition("l_suppkey")
        .sortWithinPartitions("l_suppkey", F.col("l_extendedprice").desc())
    )


@declare(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS custkey, 'automobile' AS src FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey AS custkey, 'positive' AS src FROM customer WHERE c_acctbal > 0
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: bag concatenation, duplicates preserved, zero shuffle."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey"), F.lit("automobile").alias("src")
    )
    b = c.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey"), F.lit("positive").alias("src")
    )
    return a.unionByName(b)


@declare(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): concat + hash dedup."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    return a.union(b).distinct()


@declare(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    INTERSECT
    SELECT o_custkey FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers ordering in both 1996 and 1997."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = o.where(
        F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


@declare(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    EXCEPT
    SELECT o_custkey FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers ordering in 1996 but not 1997."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = o.where(
        F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.subtract(y97)


@declare(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag intersection (multiplicity = min of the two)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_suppkey")
    b = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(b)


@declare(
    "set_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference (multiplicity = left minus right, floor 0)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_suppkey")
    b = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(b)
