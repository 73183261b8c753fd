"""Fourth TPC-H-analog batch: Q2, Q12, Q15, Q17, Q19 adapted to the fixture
schema (no partsupp / commitdate / receiptdate / shipmode columns -- see
tpch_more.py header; these five are the remaining spec queries whose *shape*
survives the adaptation).

New composite shapes vs the earlier batches:
- Q2:  argmin-per-group over a 5-table join (window MIN + equality keep-all-ties)
- Q12: conditional aggregation (CASE inside SUM) over a fact-fact join
- Q15: aggregate -> self-referential MAX (keep the top group, ties included)
- Q17: correlated per-group average gating a detail scan (decorrelated to an
       aggregate-join, the plan Catalyst itself produces for the subquery form)
- Q19: disjunction of conjunctive range predicates across both join sides

Float discipline: money sums over COMPUTED terms use FLOOR-cents (exact
BIGINT cent accumulation -- see sql_tpch_q19 and tpch_more._money_sum_cents;
per-row cent ROUND proved engine-divergent on half-cent landings at sf0.1);
quantities are integral doubles (1..50, verified in FIXTURES.md) so
AVG(l_quantity) is exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare
from .tpch_more import _money_sum


@declare(
    "sql_tpch_q2",
    oracle="""
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal
    FROM (
      SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
             MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = ps.l_partkey
      JOIN supplier ON s_suppkey = ps.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 15
    ) WHERE s_acctbal = min_bal
    """,
)
def sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) adapted: partsupp does not exist, so
    "supplies part p" is derived from shipment history (DISTINCT l_partkey,
    l_suppkey -- an aggregation that shrinks lineitem ~30x before any join)
    and s_acctbal stands in for ps_supplycost. Argmin per part via a window
    MIN + equality, keeping all tied suppliers (set semantics; the driver hash
    is order-insensitive). At scale: the distinct pre-aggregates map-side, the
    dim joins broadcast, and the window partitions by p_partkey -- same
    shuffle key the part join already produced."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal")
    )


@declare(
    "sql_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping priority classes) adapted: l_linestatus stands in
    for the missing l_shipmode. Conditional aggregation -- the CASE folds two
    logical counts into one grouped pass instead of two filtered aggregates
    unioned. The shipdate filter pushes to the lineitem scan; counts are exact
    longs, no float hazard."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@declare(
    "sql_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS tr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) / 100.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE tr = (SELECT MAX(tr) FROM revenue)
    """,
)
def sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    max-revenue supplier(s). The tie comparison happens on the exact BIGINT
    cent accumulator (FLOOR-cents discipline, cf. q19 -- per-row ROUND
    itself proved engine-divergent on q5/q10 at sf0.1), never on a double,
    so "equals the max" cannot flake across engines; the conversion to
    double dollars happens only on output. The single-row max broadcasts;
    revenue shuffles once on l_suppkey."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("long")
        ).alias("tr")
    )
    max_rev = rev.agg(F.max("tr").alias("max_tr"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .where(F.col("tr") == F.col("max_tr"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("tr").cast("double") / 100.0).alias("total_revenue"),
        )
    )


@declare(
    "sql_tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of their
    part's average quantity, for one brand/type. The oracle keeps the spec's
    correlated-subquery form; this plan is its decorrelation -- a per-part AVG
    aggregate joined back to the detail, exactly what Catalyst rewrites the
    subquery into. AVG(l_quantity) is exact (integral doubles), so the `<`
    gate agrees bit-for-bit across engines. The 1/7 division runs on one
    already-exact double -- no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "ECONOMY")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_gate")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_gate"))
        .agg(
            (
                F.sum(F.round("l_extendedprice", 2).cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


@declare(
    "sql_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three OR'd
    conjunctions mixing part-side (brand, size) and lineitem-side (quantity)
    ranges. Catalyst cannot push the whole disjunction below the join, but it
    derives and pushes the per-side implied disjunctions (brand IN the three
    values; quantity in the union of ranges) so both scans still prune --
    visible as PushedFilters in the plan. Part broadcasts; one pass, no
    union-of-three-joins.

    Money here is truncated to cents (FLOOR(x*100) summed as BIGINT), not
    ROUND-ed: at sf0.1 this query's row subset hits products where Spark
    (exact-binary BigDecimal HALF_UP) and DuckDB (shortest-decimal half-away)
    round a half-cent differently. FLOOR over the bit-identical IEEE product
    is engine-proof; the exact integer cent sum casts losslessly to double."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#15") & sz.between(1, 15) & q.between(20, 30))
    )
    term = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            (F.sum(F.floor(term * 100).cast("long")).cast("double") / 100.0).alias(
                "revenue"
            )
        )
    )
