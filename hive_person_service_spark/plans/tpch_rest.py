"""Fifth (final) TPC-H-analog batch: Q4, Q9, Q11, Q16, Q20, Q21 adapted to
the fixture schema. These were previously deemed out of scope by data model
(no partsupp table; no commitdate/receiptdate/shipmode/comment columns), but
each query's *shape* survives a principled substitution:

- "late" lineitem (Q4/Q21): l_commitdate < l_receiptdate has no fixture
  analog, so late := shipped more than 60 days after the order date
  (l_shipdate > o_orderdate + INTERVAL 60 DAYS).
- partsupp (Q11/Q16/Q20): derived from shipment history, exactly as in
  sql_tpch_q2 -- (l_partkey, l_suppkey) pairs with SUM(l_quantity) standing
  in for ps_availqty and shipped value for ps_supplycost*ps_availqty.
- supplier "Customer Complaints" exclusion (Q16): suppliers with negative
  account balance.

New composite shapes vs the earlier batches:
- Q4:  EXISTS with a *non-equi correlated* condition (semi join whose
       predicate references both sides' columns beyond the key)
- Q9:  5-table join grouped on two derived dimensions (nation x year)
- Q11: scalar-subquery gate derived from the gated aggregate itself
       (fraction-of-mean; scale-free where the spec's fixed fraction is not)
- Q16: NOT IN subquery (anti join) feeding COUNT(DISTINCT) over a derived
       many-to-many bridge
- Q20: nested IN subqueries three levels deep, decorrelated to
       aggregate-join + semi-join chains
- Q21: EXISTS and NOT EXISTS *self-joins on a fact-derived set* with a
       non-equality clause (other-supplier), the spec's hardest query

Float discipline: all money passes through the q19 FLOOR-cents pattern
(exact BIGINT cent sums; engine-proof against half-cent ROUND divergence);
quantity sums are integral doubles (exact), so 0.5x / mean gates compare
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LATE = "INTERVAL 60 DAYS"


@declare(
    "sql_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders placed in one quarter with
    at least one late lineitem, counted per priority. The EXISTS becomes a
    left-semi join whose condition is correlated beyond the key
    (l_shipdate > o_orderdate + 60 days references both sides), which Spark
    plans as a semi SMJ on o_orderkey with the non-equi clause as a join
    residual -- one shuffle each side, no row explosion (semi joins emit the
    probe row at most once). The quarter filter pushes to the orders scan and
    shrinks the probe side before the shuffle."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(_LATE)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@declare(
    "sql_tpch_q9",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                                - p_retailprice * l_quantity) * 100)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit) adapted: ps_supplycost does not exist,
    so unit cost is p_retailprice (profit = discounted revenue minus retail
    cost of the shipped quantity), and the part filter is a name prefix. The
    profit rolls up by supplier nation x order year -- two *derived*
    dimensions. Plan shape at scale: the p_name filter prunes part before its
    broadcast, lineitem joins orders on the shuffled fact key, supplier and
    nation broadcast; the group-by keys are low-cardinality (25 nations x 7
    years) so partial aggregation collapses nearly everything map-side.
    Money uses FLOOR-cents (see tpch_final.sql_tpch_q19): the subtraction is
    bit-identical IEEE in both engines and the truncated cent sum is an exact
    BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(F.floor(profit * 100).cast("long")).cast("double") / 100.0).alias(
                "profit"
            )
        )
    )


@declare(
    "sql_tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS vc
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_7', 'NATION_12')
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(vc AS DOUBLE) / 100.0 AS part_value
    FROM val
    WHERE CAST(vc AS DOUBLE) >
          1.5 * CAST((SELECT SUM(vc) FROM val) AS DOUBLE)
              / (SELECT COUNT(*) FROM val)
    """,
)
def sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) adapted: part value := shipped discounted
    revenue from suppliers in two nations (stand-in for ps_supplycost *
    ps_availqty), keeping parts whose value exceeds 1.5x the mean. The spec's
    fixed-fraction gate (value > 0.0001/SF of total) selects nothing once the
    part count grows past the fraction's reciprocal -- the mean-based gate is
    scale-free (~20% selected at every fixture SF, measured). The single-row
    mean broadcasts back over the grouped result (crossJoin of a 1-row
    aggregate). NB the gate's aggregate re-derives val, so the plan scans
    lineitem twice (audited) -- at scale, persist the grouped val (~#parts
    rows, 1000x smaller than the fact) to collapse the second scan, as with
    sql_tpch_q15's rev.
    Exactness: cent sums are BIGINT; mean = double sum / double count is the
    same IEEE division in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_12")
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("vc"))
    )
    gate = val.agg(
        (
            1.5 * F.sum("vc").cast("double") / F.count("*").cast("double")
        ).alias("vc_gate")
    )
    return (
        val.crossJoin(F.broadcast(gate))
        .where(F.col("vc").cast("double") > F.col("vc_gate"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("vc").cast("double") / 100.0).alias("part_value"),
        )
    )


@declare(
    "sql_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#21' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count per
    (brand, type, size) over the shipment-derived part-supplier bridge,
    excluding negative-balance suppliers (stand-in for the spec's 'Customer
    Complaints' comment filter). The NOT IN becomes a left-anti join -- safe
    here because s_suppkey is non-null; a nullable NOT IN column would need
    null-aware anti semantics (cf. join_null_safe). Order at scale: distinct
    the bridge first (shuffles the fact once, emits ~30x fewer rows), then
    anti-join the tiny bad-supplier list (broadcast), then broadcast-join the
    filtered part dim; COUNT(DISTINCT) re-shuffles on the three group keys
    with the distinct pushed into the partial phase."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#21")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49))
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@declare(
    "sql_tpch_q20",
    oracle="""
    WITH qty96 AS (
      SELECT l_partkey AS qp, 0.5 * SUM(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey),
    ps AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS avail
      FROM lineitem GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_11', 'NATION_19')
      AND s_suppkey IN (
        SELECT ps.l_suppkey
        FROM ps
        JOIN part ON p_partkey = ps.l_partkey
        JOIN qty96 ON qp = ps.l_partkey
        WHERE p_name LIKE 'red%' AND avail > half_qty)
    """,
)
def sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: suppliers in three
    nations whose all-time shipped quantity of some red part exceeds half of
    that part's 1996 shipment volume (ps_availqty := total shipped per
    (supplier, part); the spec's 0.5 * one-year demand gate is kept). Three
    nested IN subqueries decorrelate into: two partial aggregates over the
    same fact (different keys), an inner join on partkey, a broadcast part
    filter, and a final left-semi join into the supplier dim. Both aggregates
    shuffle lineitem on keys that start with l_partkey -- at scale a single
    repartition(l_partkey) feeds both. Quantity sums are integral doubles:
    exact, so the half-gate compares identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    qty96 = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("qp"))
        .agg((0.5 * F.sum("l_quantity")).alias("half_qty"))
    )
    ps = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("avail"))
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    excess = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(qty96, F.col("l_partkey") == F.col("qp"))
        .where(F.col("avail") > F.col("half_qty"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_11", "NATION_19")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@declare(
    "sql_tpch_q21",
    oracle="""
    WITH late AS (
      SELECT l_orderkey AS lo, l_suppkey AS ls
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.ls
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.lo AND l2.l_suppkey <> l1.ls)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.lo = l1.lo AND l3.ls <> l1.ls)
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20
    """,
)
def sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), the spec's hardest
    shape: late lineitems on finished multi-supplier orders where *only* this
    supplier was late -- an EXISTS (another supplier participated) and a NOT
    EXISTS (no other supplier was late) both self-joined against fact-derived
    sets with a non-equality residual (<> on suppkey). Spark plans both as
    SMJ semi/anti on the order key with the inequality as residual; the late
    set is derived once and reused for probe and anti sides (two scans here;
    at scale, persist it -- it is ~2% of lineitem). Aggregation on the
    supplier key collapses map-side; the final top-20 is
    TakeOrderedAndProject with s_suppkey as the deterministic tie-break."""

    def late_set() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr(_LATE))
            .select(F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls"))
        )

    l1 = late_set()
    li2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late_set().select(F.col("lo").alias("o3"), F.col("ls").alias("s3"))
    s = load_table(spark, sf_dir, "supplier")
    waiting = l1.join(
        li2, (F.col("o2") == F.col("lo")) & (F.col("s2") != F.col("ls")), "left_semi"
    ).join(
        l3, (F.col("o3") == F.col("lo")) & (F.col("s3") != F.col("ls")), "left_anti"
    )
    return (
        waiting.join(F.broadcast(s), F.col("ls") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )
