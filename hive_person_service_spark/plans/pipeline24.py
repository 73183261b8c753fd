"""Round-4 continuation batch 24: person-governance + lake-maintenance
surface.

A person service's production perimeter includes pieces no TPC-H query
touches: probabilistic record linkage across registries, privacy audits
(k-anonymity), differentially-private release counts, spatial
nearest-facility assignment, incremental materialized-view maintenance,
and reading a table whose schema evolved mid-history. Each query here is
oracle-checked (the DuckDB SQL re-derives the same answer from the
original fixtures), and each documents its 100 TB shape.

Determinism conventions follow registry.py §5.3: md5-derived hashes for
anything random-looking, FLOOR/ROUND discipline on order-dependent or
transcendental outputs, BIGINT casts on computed integers.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def _md5_long(col, nchars: int = 8):
    """First nchars hex digits of md5 as a non-negative long (engine-
    reproducible uniform hash; DuckDB twin: ('0x'||substr(md5(x),1,n))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, nchars), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Record linkage
# ---------------------------------------------------------------------------

_LINKAGE_ORACLE = """
WITH b AS (
  SELECT c_custkey AS b_key,
         CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 3 = 0
              THEN substr(c_name, 1, 10) || 'X' || substr(c_name, 12)
              ELSE c_name END AS b_name
  FROM customer
), a AS (
  SELECT c_custkey AS a_key, c_name AS a_name FROM customer
), pairs AS (
  SELECT b.b_key, a.a_key,
         CAST(levenshtein(b.b_name, a.a_name) AS BIGINT) AS edit_dist
  FROM b JOIN a
    ON substr(b.b_name, 15, 4) = substr(a.a_name, 15, 4)
  WHERE levenshtein(b.b_name, a.a_name) <= 2
)
SELECT b_key, a_key, edit_dist,
       CAST(b_key = a_key AS BOOLEAN) AS true_match
FROM pairs
QUALIFY ROW_NUMBER() OVER (PARTITION BY b_key ORDER BY edit_dist, a_key) = 1
"""


@declare("person_record_linkage", oracle=_LINKAGE_ORACLE)
def person_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (the person-service core loop): registry
    B carries deterministically-injected typos (md5-selected third of rows,
    digit 2 of the id overwritten with 'X' -- the fixture corpus has no
    natural dirty twin), and each B record is linked back to registry A by
    blocked fuzzy match: block on the LAST four name digits (untouched by
    the typo; zero-padding makes leading digits degenerate), verify with
    bounded levenshtein <= 2, take the best match per B record
    (min edit distance, id tie-break). The blocking key keeps candidate
    pairs near-linear in N (block size ~N/10^4); the window partitions by
    b_key over those few candidates -- never a global window. At 100 TB
    both sides shuffle on the block key once; no cross join exists. Spark's
    3-arg bounded levenshtein is a banded DP, O(len*t) per pair."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.when(
            _md5_long(F.col("c_custkey").cast("string")) % 3 == 0,
            F.concat(
                F.substring("c_name", 1, 10),
                F.lit("X"),
                F.substring("c_name", 12, 7),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("b_name"),
    )
    a = c.select(
        F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name")
    )
    pairs = (
        b.join(
            a,
            F.substring("b_name", 15, 4) == F.substring("a_name", 15, 4),
        )
        .withColumn("edit_dist", F.levenshtein("b_name", "a_name", 2).cast("long"))
        .where(F.col("edit_dist") >= 0)
    )
    w = Window.partitionBy("b_key").orderBy("edit_dist", "a_key")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "b_key",
            "a_key",
            "edit_dist",
            (F.col("b_key") == F.col("a_key")).alias("true_match"),
        )
    )


# ---------------------------------------------------------------------------
# Privacy audits
# ---------------------------------------------------------------------------


@declare(
    "privacy_k_anonymity",
    oracle="""
    WITH quasi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
             COUNT(*) AS grp_n
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(grp_n AS BIGINT) AS grp_n,
           CAST(grp_n < 5 AS BOOLEAN) AS violates_k5
    FROM quasi
    WHERE grp_n < 5
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, segment,
    $2000 balance band): every equivalence class smaller than k=5 is a
    re-identification risk the service must generalize or suppress before
    release. One hash aggregate over the dimension-sized QI space -- the
    100 TB cost is the single groupBy shuffle, and the violating-class
    report is at most |QI-space| rows, no matter the person count."""
    c = load_table(spark, sf_dir, "customer")
    quasi = (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        )
        .agg(F.count("*").alias("grp_n"))
    )
    return quasi.where(F.col("grp_n") < 5).select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        F.col("grp_n").cast("long").alias("grp_n"),
        (F.col("grp_n") < 5).alias("violates_k5"),
    )


@declare(
    "privacy_dp_counts",
    oracle="""
    WITH grp AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM customer GROUP BY c_nationkey
    ), noise AS (
      SELECT c_nationkey, true_n,
             ((('0x' || substr(md5('dp1:' || CAST(c_nationkey AS VARCHAR)), 1, 8))::UBIGINT
               % 1000000) + 0.5) / 1000000.0 AS u
      FROM grp
    )
    SELECT c_nationkey, true_n,
           CAST(FLOOR((true_n + (CASE WHEN u < 0.5 THEN -2.0 ELSE 2.0 END)
                       * ln(1.0 - 2.0 * abs(u - 0.5))) * 100) AS BIGINT)
             AS noisy_n_c,
           CAST(FLOOR(2.0 * ln(1.0 - 2.0 * abs(u - 0.5)) * -1e6) AS BIGINT)
             AS noise_mag_u
    FROM noise
    """,
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release counts: per-nation person counts with
    Laplace(b=2) noise (eps=0.5 for a count query of sensitivity 1). The
    noise draw inverts the Laplace CDF on an md5-derived uniform keyed by
    the released CELL (not the person), so the mechanism is engine-
    reproducible -- the property that lets an audit job re-verify a
    historical release bit-for-bit. Noise applies POST-aggregation to the
    dimension-sized result: at 100 TB the scan/shuffle cost is the plain
    groupBy; the DP layer is free. FLOOR-of-scaled discipline on the ln
    output keeps the cross-engine hash stable."""
    c = load_table(spark, sf_dir, "customer")
    grp = c.groupBy("c_nationkey").agg(F.count("*").cast("long").alias("true_n"))
    u = (
        (_md5_long(F.concat(F.lit("dp1:"), F.col("c_nationkey").cast("string"))) % 1000000)
        + 0.5
    ) / 1000000.0
    mag = F.lit(2.0) * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))  # <= 0
    signed = F.when(u < 0.5, -mag).otherwise(mag)
    return grp.select(
        "c_nationkey",
        "true_n",
        F.floor((F.col("true_n") + signed) * 100).cast("long").alias("noisy_n_c"),
        F.floor(mag * -1e6).cast("long").alias("noise_mag_u"),
    )


# ---------------------------------------------------------------------------
# Spatial nearest-facility join
# ---------------------------------------------------------------------------

_GEO_ORACLE = """
WITH cust AS (
  SELECT c_custkey,
         (('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
          % 1000000) / 100000.0 AS lat,
         (('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
          % 1000000) / 100000.0 AS lon
  FROM customer
), supp AS (
  SELECT s_suppkey,
         (('0x' || substr(md5('lat:s' || CAST(s_suppkey AS VARCHAR)), 1, 8))::UBIGINT
          % 1000000) / 100000.0 AS lat,
         (('0x' || substr(md5('lon:s' || CAST(s_suppkey AS VARCHAR)), 1, 8))::UBIGINT
          % 1000000) / 100000.0 AS lon
  FROM supplier
), pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
         (c.lat - s.lat) * (c.lat - s.lat)
         + (c.lon - s.lon) * (c.lon - s.lon) AS d2
  FROM cust c CROSS JOIN supp s
)
SELECT c_custkey, s_suppkey AS nearest_suppkey, d2 AS dist2
FROM pairs
QUALIFY ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) = 1
"""


@declare("geo_nearest_supplier", oracle=_GEO_ORACLE)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment: every person is assigned the closest
    supplier site in a synthetic 10x10-degree service region (coordinates
    md5-derived from the keys -- the fixtures carry no geo columns).
    Spark side BROADCASTS the facility list (facility dims are small by
    nature) and reduces per person with one partial-aggregable min(struct)
    -- a single pass over the person table, no shuffle of the fact side at
    all, no window. Squared planar distance keeps the comparison free of
    transcendental libm (bit-identical IEEE adds/multiplies cross-engine);
    at city scale the same plan holds with haversine. The DuckDB oracle
    brute-forces the cross join; Spark's broadcast form IS that same
    all-pairs reduce, executed map-side. For facility lists too big to
    broadcast, operators/ivf.py's cell-partitioned probe is the scale
    path (grid cells = IVF cells)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((_md5_long(F.concat(F.lit("lat:"), F.col("c_custkey").cast("string"))) % 1000000)
         / 100000.0).alias("c_lat"),
        ((_md5_long(F.concat(F.lit("lon:"), F.col("c_custkey").cast("string"))) % 1000000)
         / 100000.0).alias("c_lon"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((_md5_long(F.concat(F.lit("lat:s"), F.col("s_suppkey").cast("string"))) % 1000000)
         / 100000.0).alias("s_lat"),
        ((_md5_long(F.concat(F.lit("lon:s"), F.col("s_suppkey").cast("string"))) % 1000000)
         / 100000.0).alias("s_lon"),
    )
    d2 = (F.col("c_lat") - F.col("s_lat")) * (F.col("c_lat") - F.col("s_lat")) + (
        F.col("c_lon") - F.col("s_lon")
    ) * (F.col("c_lon") - F.col("s_lon"))
    # The single-file fixture scan gives the person side ONE partition,
    # and the broadcast join inherits it — the 15M-pair reduce ran on one
    # core (sweep-measured ~29s at sf0.1). Spread the person side first;
    # the broadcast join then parallelizes across all cores (<2s). At
    # cluster scale the scan arrives already multi-split and this
    # repartition is a no-op guard, same idiom as jaccard_join_prefix.
    sc = spark.sparkContext
    if c.rdd.getNumPartitions() < sc.defaultParallelism:
        c = c.repartition(sc.defaultParallelism)
    pairs = c.join(F.broadcast(s)).select(
        "c_custkey", "s_suppkey", d2.alias("d2")
    )
    # Two-pass argmin instead of min(struct): min over a plain double
    # stays in codegen HashAggregate (struct-min falls out to
    # ObjectAggregate), and the tie-broken join-back touches the same
    # cheap broadcast-join projection a second time. Both passes
    # partial-aggregate map-side; d2 equality in the join-back is exact
    # (identical IEEE expression both times).
    best = (
        pairs.groupBy("c_custkey")
        .agg(F.min("d2").alias("best_d2"))
        .select(F.col("c_custkey").alias("b_custkey"), "best_d2")
    )
    return (
        pairs.join(
            F.broadcast(best),
            (F.col("c_custkey") == F.col("b_custkey"))
            & (F.col("d2") == F.col("best_d2")),
        )
        .groupBy("c_custkey", "best_d2")
        .agg(F.min("s_suppkey").alias("nearest_suppkey"))
        .select(
            "c_custkey",
            "nearest_suppkey",
            F.col("best_d2").alias("dist2"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------


@declare(
    "mv_incremental_refresh",
    oracle="""
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY 1, 2
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily (day, status)
    revenue rollup is maintained through three simulated arrival batches
    (orders split by md5(orderkey) % 3 -- the partitions a landing zone
    would deliver). Each step aggregates ONLY the delta batch and folds it
    into the persisted MV state by (day, status) sum-merge -- the classic
    additive-state refresh: work per refresh is proportional to the DELTA,
    never the history. State lives in parquet (staged, identity-cached on
    the fixture), integer-cent sums make the merge order-free and the
    result bit-exact. The oracle recomputes the rollup from scratch over
    all of orders -- agreement proves three incremental folds == one full
    rebuild. At 100 TB the MV is dimension-x-day sized; each fold shuffles
    delta-aggregates only."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:mv3".encode()
    ).hexdigest()[:12]
    final = os.path.join(_LAYOUT_ROOT, f"orders_mv_{digest}")
    if not os.path.exists(os.path.join(final, "_SUCCESS")):
        o = load_table(spark, sf_dir, "orders").select(
            F.to_date("o_orderdate").cast("string").alias("day"),
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (_md5_long(F.col("o_orderkey").cast("string")) % 3).alias("batch"),
        )
        import shutil

        work = final + ".work"
        shutil.rmtree(work, ignore_errors=True)
        state = None
        try:
            for i in range(3):
                delta = (
                    o.where(F.col("batch") == i)
                    .groupBy("day", "o_orderstatus")
                    .agg(
                        F.count("*").cast("long").alias("n_orders"),
                        F.sum("cents").cast("long").alias("total_cents"),
                    )
                )
                if state is None:
                    merged = delta
                else:
                    prev = spark.read.parquet(state)
                    merged = (
                        prev.unionByName(delta)
                        .groupBy("day", "o_orderstatus")
                        .agg(
                            F.sum("n_orders").cast("long").alias("n_orders"),
                            F.sum("total_cents").cast("long").alias("total_cents"),
                        )
                    )
                step = os.path.join(work, f"step{i}")
                merged.write.mode("overwrite").parquet(step)
                state = step
            # Atomic-ish publish: write final from the last step, then drop work.
            spark.read.parquet(state).write.mode("overwrite").parquet(final)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return spark.read.parquet(final)


# ---------------------------------------------------------------------------
# Schema evolution
# ---------------------------------------------------------------------------


@declare(
    "scan_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 2 = 1 THEN
               CASE (('0x' || substr(md5('ch:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT % 3)
                 WHEN 0 THEN 'web' WHEN 1 THEN 'store' ELSE 'phone' END
             END AS o_channel
      FROM orders
    )
    SELECT COALESCE(o_orderstatus, '<pre-migration>') AS status,
           COALESCE(o_channel, '<pre-migration>') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(o_orderkey) AS min_key
    FROM unioned
    GROUP BY 1, 2
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: the orders history is laid down in two
    generations (identity-cached once) -- v1 files carry only
    (o_orderkey, o_totalprice); v2 files add o_orderstatus AND a
    brand-new o_channel column (md5-derived, the fixture has none). The
    mergeSchema read unions by name, null-backfilling old files -- the
    exact semantics a 100 TB lake needs when a column lands mid-history
    (no rewrite of old files, pruning still per-file). The oracle
    reconstructs the same union arithmetically from the original table;
    agreement proves no row or value was lost across generations."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:sev".encode()
    ).hexdigest()[:12]
    root = os.path.join(_LAYOUT_ROOT, f"orders_schemaevo_{digest}")
    v1, v2 = os.path.join(root, "v1"), os.path.join(root, "v2")
    if not (
        os.path.exists(os.path.join(v1, "_SUCCESS"))
        and os.path.exists(os.path.join(v2, "_SUCCESS"))
    ):
        o = load_table(spark, sf_dir, "orders")
        o.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(v1)
        channel = (
            F.when(
                _md5_long(F.concat(F.lit("ch:"), F.col("o_orderkey").cast("string"))) % 3 == 0,
                "web",
            )
            .when(
                _md5_long(F.concat(F.lit("ch:"), F.col("o_orderkey").cast("string"))) % 3 == 1,
                "store",
            )
            .otherwise("phone")
        )
        o.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderstatus", channel.alias("o_channel")
        ).write.mode("overwrite").parquet(v2)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.groupBy(
        F.coalesce("o_orderstatus", F.lit("<pre-migration>")).alias("status"),
        F.coalesce("o_channel", F.lit("<pre-migration>")).alias("channel"),
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").alias("min_key"),
    )


# ---------------------------------------------------------------------------
# mapInArrow UDF surface
# ---------------------------------------------------------------------------


@declare(
    "udf_map_in_arrow",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR((c_acctbal * 1.07 + 25.0) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS adj_bal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow extension point (Spark 4's lowest-overhead Python hook:
    raw Arrow RecordBatches, no pandas conversion): a per-batch
    vectorized fee adjustment (bal * 1.07 + 25) computed with
    pyarrow.compute kernels, then aggregated JVM-side. The Python stage
    sees columnar batches only -- zero per-row Python, zero copies beyond
    the Arrow transfer -- and the surrounding plan (filter pushdown below,
    hash aggregate above) is unchanged. This is where a C-backed custom
    kernel (tokenizer, codec) would mount; for pure arithmetic like this
    the built-in expression (used by the oracle) stays the production
    choice. The rollup quantizes each adjusted value to integer cents
    (FLOOR(x*100+0.5) -- floor of an identical IEEE double is
    engine-identical, no ROUND tie semantics) BEFORE summing, so the
    money total is order-independent and scale-invariant (the plain
    double SUM flipped its last ROUND digit at sf1)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    sel = c.select("c_mktsegment", "c_acctbal")

    def adjust(batches):
        for batch in batches:
            adj = pc.add(pc.multiply(batch.column("c_acctbal"), 1.07), 25.0)
            yield pa.RecordBatch.from_arrays(
                [batch.column("c_mktsegment"), adj],
                names=["c_mktsegment", "adj"],
            )

    out = sel.mapInArrow(adjust, "c_mktsegment string, adj double")
    return out.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_cust"),
        (
            F.sum(F.floor(F.col("adj") * 100 + 0.5).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("adj_bal"),
    )
