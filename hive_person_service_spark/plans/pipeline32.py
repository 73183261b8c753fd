"""Round-4 continuation batch 32: windowed percentiles, sequence pattern
matching, explicit bloom-prefiltered joins, observed pipelines, small-file
compaction, weighted reservoir sampling, l-diversity, polymorphic UDTF.

Each entry covers a production idiom the registry did not yet declare:

- win_percentile: holistic aggregate (percentile) AS A WINDOW FUNCTION —
  per-row access to the partition's quartiles, the shape GROUP BY cannot
  express without a self-join.
- events_match_recognize: SQL MATCH_RECOGNIZE analog (Spark has none) —
  regex over each user's time-ordered event-type sequence.
- join_bloom_prefilter: operators/bloom.py run end-to-end as a declared
  query; the oracle is the PLAIN semi join, so agreement proves the
  probabilistic prefilter is invisible in the result.
- obs_pipeline_metrics: df.observe() audit counters riding the query —
  zero-cost input accounting a production pipeline wants on every run.
- table_compact_roundtrip: the small-files maintenance operator
  (operators/maintenance.py compact_parquet) proven content-preserving
  against the original table.
- sample_weighted_topk: Efraimidis–Spirakis weighted sampling without
  replacement, derandomized via the registry's Knuth-hash uniform — the
  principled "pick k docs by quality weight" primitive.
- privacy_l_diversity: the l-diversity audit that complements
  privacy_k_anonymity (k hides group size; l guards against a group
  sharing one sensitive value).
- udtf_ngrams_analyze: Spark 4 polymorphic Python UDTF — output schema
  computed at ANALYZE time from the arguments (column named gram<n>).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


@declare(
    "win_percentile",
    oracle="""
    WITH wq AS (
      SELECT l_suppkey, l_quantity,
             quantile_cont(l_quantity, 0.25) OVER (PARTITION BY l_suppkey) AS q25,
             quantile_cont(l_quantity, 0.50) OVER (PARTITION BY l_suppkey) AS q50,
             quantile_cont(l_quantity, 0.75) OVER (PARTITION BY l_suppkey) AS q75
      FROM lineitem
    )
    SELECT l_suppkey, q25, q50, q75,
           CAST(SUM(CASE WHEN l_quantity > q50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_median
    FROM wq GROUP BY 1, 2, 3, 4
    """,
)
def win_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile as a WINDOW function: every lineitem row sees its
    supplier's quantity quartiles, so 'above this supplier's median' is a
    plain row predicate — the per-row-vs-own-group comparison that GROUP
    BY alone cannot express without a join back. One shuffle on
    l_suppkey; partitions are per-supplier slices (bounded: ~60 lines per
    supplier at any sf, it's a ratio of fixture generators), so the
    holistic sort inside WindowExec never sees unbounded state. Quartile
    fractions 0.25/0.5/0.75 interpolate integer-valued quantities at
    exact dyadic fractions — bit-identical across engines regardless of
    interpolation formula."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey")
    qq = li.select(
        "l_suppkey",
        "l_quantity",
        F.percentile("l_quantity", F.lit(0.25)).over(w).alias("q25"),
        F.percentile("l_quantity", F.lit(0.5)).over(w).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).over(w).alias("q75"),
    )
    return qq.groupBy("l_suppkey", "q25", "q50", "q75").agg(
        F.sum(F.when(F.col("l_quantity") > F.col("q50"), 1).otherwise(0))
        .cast("long")
        .alias("n_above_median")
    )


@declare(
    "events_match_recognize",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(event_type, ' ' ORDER BY ts, event_id) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(s, 'view( click)* purchase')) AS BIGINT)
             AS n_funnels
    FROM seq
    WHERE len(regexp_extract_all(s, 'view( click)* purchase')) > 0
    """,
)
def events_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE analog: detect the funnel pattern
    view (click)* purchase as a REGEX over each user's time-ordered
    event-type sequence — row-pattern matching, the one classic SQL:2016
    feature Spark lacks natively. Built from primitives Catalyst
    optimizes well: groupBy(user) + collect_list(struct(ts, event_id,
    type)) -> array_sort (deterministic tie-break on event_id) ->
    array_join -> regexp_extract_all; both engines scan left-to-right,
    non-overlapping, greedy, so match counts agree exactly. Per-user
    sequences are session-scale (bounded by per-user activity, not
    corpus size); at 100 TB the same shape runs per (user, day) to cap
    state, exactly like the sessionize queries."""
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            " ",
        ).alias("s"),
        F.count("*").cast("long").alias("n_events"),
    )
    n_funnels = F.size(
        F.regexp_extract_all(F.col("s"), F.lit("view( click)* purchase"), F.lit(0))
    ).cast("long")
    return (
        seq.select("user_id", "n_events", n_funnels.alias("n_funnels"))
        .where(F.col("n_funnels") > 0)
    )


@declare(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           -- integer-cents checksum: per-row product floored to cents then
           -- summed exactly -- immune to the order-dependent double-sum
           -- ROUND boundary flips a 10x scale exposes
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    WHERE l.l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 1000)
    GROUP BY l.l_suppkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-prefiltered semi join (operators/bloom.py): the
    dimension's keys fold into a 64 Kbit filter DISTRIBUTED (mapInPandas
    partials OR-ed on the driver — never the keys), the fact side drops
    non-candidate rows through an Arrow-batched probe BEFORE the shuffle,
    and the exact semi join removes the false positives — so the oracle
    is the plain semi join and agreement proves the bloom is invisible.
    This is Spark's runtime-filter pattern made a reusable library step
    for dims too big to broadcast-hash (10 bits/key vs ~32 bytes/key) or
    filters reused across queries. Selectivity is pytest-pinned
    (tests/test_pipeline32.py)."""
    from ..operators.bloom import bloom_prefiltered_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") >= 1000)
        .select("s_suppkey")
    )
    kept = bloom_prefiltered_semi_join(li, dim, "l_suppkey", "s_suppkey")
    return kept.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("revenue_cents"),
    )


# Module-level so pytest can read the captured metrics after the driver
# (or a test) executes the returned DataFrame.
LAST_OBSERVATION: dict[str, Observation] = {}


@declare(
    "obs_pipeline_metrics",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity < 30
    GROUP BY l_returnflag
    """,
)
def obs_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline with df.observe() audit counters: the scan reports input
    rows and an input checksum through a CollectMetrics node while the
    query computes its result — the accumulator-based observability hook
    a production run attaches to every stage (dropped-row accounting,
    freshness checks) WITHOUT a second pass over the data. The metrics
    ride the same job: zero extra scans, zero extra shuffles. Note the
    observe sits ABOVE the filter on purpose — it must count pre-filter
    input, which pins the filter at the metrics boundary instead of the
    scan; the audit is the point, and the scan still prunes columns."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("pipeline_audit")
    LAST_OBSERVATION["obs_pipeline_metrics"] = obs
    audited = li.select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount").observe(
        obs,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum("l_quantity").alias("input_qty"),
    )
    return (
        audited.where(F.col("l_quantity") < 30)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def _compacted_orders_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a deliberately fragmented
    copy of orders, then run the small-file compaction operator over it.
    Returns the compacted path. Same identity-cached discipline as
    pipeline23._format_layout: a regenerated fixture rebuilds the layout."""
    from ..operators.maintenance import compact_parquet

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_compacted_{digest}")
    marker = os.path.join(path, "_COMPACTED")
    if not os.path.exists(marker):
        o = load_table(spark, sf_dir, "orders")
        # 48 splinter files of a few KB each: the pathological layout a
        # streaming ingest leaves behind.
        o.repartition(48).write.mode("overwrite").parquet(path)
        compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return path


@declare(
    "table_compact_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderpriority
    """,
)
def table_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction proven content-preserving: orders splintered
    into 48 tiny files (the streaming-ingest pathology), compacted by
    operators/maintenance.py compact_parquet (size-targeted coalesce +
    stage-then-atomic-swap), read back and aggregated; the ORACLE runs on
    the ORIGINAL table, so agreement proves the maintenance pass kept
    every row. At 100 TB this is the nightly OPTIMIZE job: fewer files =
    fewer tasks, fewer footer reads, bigger scan ranges; the file-count
    collapse is pytest-pinned."""
    path = _compacted_orders_layout(spark, sf_dir)
    o = spark.read.parquet(path)
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@declare(
    "sample_weighted_topk",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) + 1) / 1000004)
               / (CAST(n_chars AS DOUBLE) / 558) AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars, ROUND(es_key, 6) AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 20
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis): each
    doc draws key u^(1/w) — here the monotone-equivalent ln(u)/w ranked
    descending — and the top-k keys ARE a weighted sample without
    replacement; u comes from the registry's Knuth multiplicative hash,
    so the draw is deterministic across engines, runs, partitionings, and
    scales (rand() is none of those). Map-side key computation +
    TakeOrderedAndProject: no shuffle beyond the top-k reduction. This is
    the principled 'sample k documents proportional to quality weight'
    primitive dataset assembly needs; sample_importance is its Bernoulli
    (with-replacement-ish, unbounded size) sibling."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)).cast("double")
        + 1
    ) / 1000004
    w = F.col("n_chars").cast("double") / 558
    keyed = d.select(
        "doc_id", "n_chars", (F.log(u) / w).alias("es_key_raw")
    )
    return (
        keyed.orderBy(F.col("es_key_raw").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_chars", F.round("es_key_raw", 6).alias("es_key"))
    )


@declare(
    "privacy_l_diversity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_k,
           CAST(COUNT(DISTINCT CASE
                WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END) AS BIGINT) AS l_distinct
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) >= 3
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the quasi-identifier (nation, segment):
    per equivalence class, the count of DISTINCT sensitive values (an
    account-balance tier). k-anonymity (privacy_k_anonymity) only bounds
    group SIZE; a group of 50 rows all 'overdrawn' still leaks the
    sensitive attribute — l_distinct = 1 flags exactly those homogeneity
    attacks. One hash aggregation with a distinct-within-group; the QI
    space is dimension-bounded so output never scales with the fact
    table."""
    c = load_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return (
        c.select("c_nationkey", "c_mktsegment", tier.alias("tier"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("group_k"),
            F.countDistinct("tier").cast("long").alias("l_distinct"),
        )
        .where(F.col("group_k") >= 3)
    )


@declare(
    "udtf_ngrams_analyze",
    oracle="""
    WITH grams AS (
      SELECT unnest(list_transform(
               generate_series(1, GREATEST(length(lower(text)) - 2, 0)),
               i -> substr(lower(text), CAST(i AS INTEGER), 3))) AS gram3
      FROM documents WHERE doc_id < 40
    )
    SELECT gram3, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams
    GROUP BY gram3
    HAVING COUNT(*) >= 25
    """,
)
def udtf_ngrams_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the output schema is computed at
    ANALYZE time from the call site — the gram column is named gram<n>
    for the literal n the query passes, and the oracle addresses gram3 by
    that computed name, proving the analyze path ran. The UDTF consumes a
    TABLE() argument (lateral per-row expansion, the Hive GenericUDTF /
    LATERAL VIEW analog beyond built-in explode). Python-per-row is the
    slow path by design — the declared query bounds it to a fixed 40-doc
    slice at every sf; for corpus-scale n-gramming the engine's JVM-side
    text_* queries are the production tier (this declares the EXTENSION
    POINT, like udtf_python)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class CharNGrams:
        @staticmethod
        def analyze(t: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            out = StructType().add("doc_id", LongType()).add(
                f"gram{n.value}", StringType()
            )
            return AnalyzeResult(out)

        def eval(self, row, n: int):
            text = (row["text"] or "").lower()
            for i in range(len(text) - n + 1):
                yield row["doc_id"], text[i : i + n]

    spark.udtf.register("char_ngrams", udtf(CharNGrams))
    d = load_table(spark, sf_dir, "documents")
    d.where(F.col("doc_id") < 40).select("doc_id", "text").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT gram3, CAST(COUNT(*) AS BIGINT) AS n
        FROM char_ngrams(TABLE(SELECT doc_id, text FROM _udtf_docs), 3)
        GROUP BY gram3
        HAVING COUNT(*) >= 25
        """
    )
