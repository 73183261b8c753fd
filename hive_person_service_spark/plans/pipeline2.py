"""Training-data pipeline, second batch: RAG-style document chunking,
deterministic stratified sampling, an inverted index over tokens, and
per-type anomaly flagging on the event stream. All four are oracle-checked
(SURVEY.md §2.J extends beyond the reference surface per the north star).

Engine-agreement notes:
- Chunk positions come from an explicit 1-based arithmetic sequence, and the
  chunk id is FLOOR((pos-1)/stride) computed identically in both engines --
  never from unnest ordinality, which DuckDB and Spark number differently.
- Stratified sampling buckets on the first two hex chars of md5(lang:doc_id):
  md5 is bit-stable and lowercase-hex in both engines, and the keep decision
  is a lexicographic string compare, so the sample is reproducible anywhere
  (unlike xxhash64/hash, whose seeds are Spark-specific -- that is why
  dataset_split is rows-only but this query oracle-checks).
- At 100 TB: chunking and sampling are embarrassingly parallel map-side ops
  (no shuffle at all); the inverted index is one token-keyed shuffle with
  map-side partial distinct; anomaly flagging is a small broadcast of
  per-type stats back onto the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

CHUNK = 100
STRIDE = 80


@declare(
    "text_chunk",
    oracle=f"""
    SELECT doc_id,
           CAST(FLOOR((pos - 1) / {STRIDE}.0) AS BIGINT) AS chunk_id,
           substr(text, CAST(pos AS INTEGER), {CHUNK}) AS chunk_text,
           length(substr(text, CAST(pos AS INTEGER), {CHUNK})) AS chunk_len
    FROM documents,
         unnest(generate_series(1, length(text), {STRIDE})) AS t(pos)
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width overlapping character chunks (window 100, stride 80 -- 20
    chars of overlap), the standard RAG / context-window packing primitive.
    One generate-positions + substring pass, fully map-side: no shuffle, no
    Python, scales linearly with corpus bytes. The final short chunk at each
    document tail is kept (real pipelines pad or merge it downstream)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text"), F.lit(STRIDE))
            ).alias("pos"),
            "text",
        )
        .select(
            "doc_id",
            F.floor((F.col("pos") - 1) / float(STRIDE)).cast("long").alias("chunk_id"),
            F.expr(f"substring(text, pos, {CHUNK})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


@declare(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source, n_chars, bucket
    FROM (
      SELECT doc_id, lang, source, n_chars,
             substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents)
    WHERE bucket < (CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling: hash each doc into one of 256
    hex buckets via md5(lang:doc_id) and keep a language-dependent prefix
    range -- here 25% of English ('00'..'3f') and 50% of everything else,
    the downweight-the-overrepresented-language move every corpus build
    makes. Pure map-side, reproducible across engines and runs, and rows
    keep their bucket so downstream stages can sub-sample further without
    rehashing."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    threshold = F.when(F.col("lang") == "en", "40").otherwise("80")
    return docs.withColumn("bucket", bucket).where(F.col("bucket") < threshold).select(
        "doc_id", "lang", "source", "n_chars", "bucket"
    )


@declare(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, token
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents))
    SELECT token, COUNT(*) AS df, list(doc_id ORDER BY doc_id) AS postings
    FROM tok GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists: token -> document frequency + sorted doc_id list, the
    backbone of the shingle-join dedup/decontamination operators
    (operators/dedup.py) exposed as a standalone index build. tokenize ->
    DISTINCT (map-side partial) -> one token-keyed shuffle. postings is
    sort_array'd for determinism (SURVEY.md §5.3). At 100 TB the only skew
    risk is stopword tokens; the dedup operators cap or drop top-df tokens,
    and this build keeps them to stay a faithful index."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    return tok.groupBy("token").agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )


@declare(
    "scd2_history",
    oracle="""
    WITH upd AS (
      SELECT user_id, value AS balance, CAST(ts AS TIMESTAMP) AS ts
      FROM events),
    dedup AS (
      SELECT user_id, balance, ts FROM (
        SELECT user_id, balance, ts,
               LAG(balance) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM upd)
      WHERE prev_ts IS NULL OR balance IS DISTINCT FROM prev)
    SELECT user_id, balance, ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS effective_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             AS is_current
    FROM dedup
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 rebuild of the person/profile dimension from the event
    stream, exercising the actual operators/scd.py merge (from an empty
    history) rather than a hand-inlined window query -- the oracle is the
    equivalent lag-dedup + lead-interval SQL, so the operator's semantics
    (consecutive no-op collapse, half-open versioning, is_current flag) are
    DuckDB-checked end to end. The incremental form of the same operator is
    exercised by the foreachBatch streaming sink (streaming/jobs.py,
    tests/test_scd.py)."""
    from ..operators.scd import scd2_merge

    upd = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("value").alias("balance"), "ts")
    )
    empty_hist = upd.limit(0).select(
        "user_id",
        "balance",
        F.col("ts").alias("effective_from"),
        F.col("ts").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    return scd2_merge(empty_hist, upd, ["user_id"], ["balance"], "ts")


@declare(
    "events_anomaly",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type)
    SELECT event_id, e.event_type, value,
           ROUND((value - m) / sd, 4) AS zscore
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE ABS(value - m) > 3 * sd
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|value - mean| > 3 sigma): grouped stats on
    a first pass, broadcast back onto the stream, filter. The stats side is
    five rows -- at any scale the join is a broadcast, so the whole operator
    is one grouped shuffle plus a map. The 3-sigma gate compares doubles that
    the two engines accumulate in different orders; divergence is ~1e-12
    relative, so a boundary flip needs a value within that of exactly
    3 sigma -- not observed at any fixture SF."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("s_type")).agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(stats), ev.event_type == F.col("s_type"))
        .where(F.abs(F.col("value") - F.col("m")) > 3 * F.col("sd"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("m")) / F.col("sd"), 4).alias("zscore"),
        )
    )


@declare("graph_pagerank", oracle=None)  # rows-only: iterative power method
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier shipment graph (who supplies the
    best-connected customers), top-20. Iterative DataFrame power method
    (operators/graph.py): per round one edges-join-ranks shuffle + a scalar
    dangling-mass aggregate, lineage cut by localCheckpoint. Not
    SQL-expressible in one query => rows-only; pytest pins ranks against a
    dense numpy power iteration including dangling redistribution
    (tests/test_graph.py)."""
    from ..operators.graph import pagerank, top_ranked

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, n_iter=8)
    return top_ranked(ranks, k=20).select(
        "node", F.round("rank", 8).alias("rank")
    )


_PROFILE_COLS = ["c_custkey", "c_nationkey", "c_mktsegment", "c_name"]


@declare(
    "quality_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col, COUNT(*) AS n_rows,
               SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls,
               COUNT(DISTINCT {c}) AS ndv,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM customer"""
        for c in _PROFILE_COLS
    ),
)
def quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact long-form data profile (col -> rows / nulls / NDV / min / max),
    the trust-but-verify scan before using a new table drop. One single-row
    aggregate per column unioned long-form: each branch's scan prunes to its
    one column, so total IO equals one scan of the profiled columns, and
    every branch partial-aggregates map-side. min/max compute on the native
    type and cast to string only for the uniform output schema (int/string
    columns only here -- double formatting differs between engines). The
    approx wide-format twin is operators/quality.py::profile (HLL NDV, one
    pass, no union)."""
    out = None
    for c in _PROFILE_COLS:
        cust = load_table(spark, sf_dir, "customer")
        branch = cust.agg(
            F.lit(c).alias("col"),
            F.count("*").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.countDistinct(c).alias("ndv"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@declare(
    "graph_degrees",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    ind AS (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst)
    SELECT 'out' AS side, CAST(d AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM outd GROUP BY d
    UNION ALL
    SELECT 'in' AS side, CAST(d AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM ind GROUP BY d
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer->supplier shipment graph (the
    oracle-checked face of the graph family: pagerank/components are
    iterative and rows-only, but the degree histogram -- the first thing
    anyone asks of a graph -- is two groupBys). One edges CTE feeds both
    sides; at scale this is a single shuffle per direction over the
    deduped edge list."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    outd = (
        edges.groupBy("src").agg(F.count("*").alias("d"))
        .groupBy("d").agg(F.count("*").alias("n_nodes"))
        .select(F.lit("out").alias("side"), F.col("d").alias("degree"), "n_nodes")
    )
    ind = (
        edges.groupBy("dst").agg(F.count("*").alias("d"))
        .groupBy("d").agg(F.count("*").alias("n_nodes"))
        .select(F.lit("in").alias("side"), F.col("d").alias("degree"), "n_nodes")
    )
    return outd.unionByName(ind)


@declare(
    "graph_components",
    oracle="""
    WITH RECURSIVE tok AS (SELECT doc_id, str_split(text, ' ') AS tokens
                           FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(tokens[i:i+2], ' ')
                     FOR i IN range(1, greatest(len(tokens) - 1, 1))]) AS shingle
      FROM tok),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    p0 AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2) p
      JOIN cnt ca ON id_a = ca.doc_id
      JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.5),
    sym AS (SELECT id_a AS a, id_b AS b FROM p0
            UNION SELECT id_b, id_a FROM p0),
    reach(node, r) AS (
      SELECT DISTINCT a, a FROM sym
      UNION
      SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node),
    comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
    SELECT CAST(node AS BIGINT) AS doc_id, CAST(comp AS BIGINT) AS comp,
           CAST(COUNT(*) OVER (PARTITION BY comp) AS BIGINT) AS comp_size
    FROM comp
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components, ORACLE-CHECKED end to end: the iterative
    min-label propagation the dedup pipeline runs (operators/clustering.py
    -- one groupBy-shuffle per round, lineage cut by localCheckpoint)
    over an exactly-SQL-expressible candidate graph (the word-3-gram
    Jaccard >= 0.5 pair set of dedup_ngram_jaccard), diffed against a
    DuckDB WITH RECURSIVE reachability closure. dedup_cluster runs the
    SAME labeler over LSH pairs (rows-only because LSH isn't
    DuckDB-expressible); this query certifies the labeler itself --
    including multi-hop transitivity (the fixtures contain a size-3
    chain) -- against an independent engine. At 100 TB the recursive
    closure is oracle-side only; the Spark path stays O(rounds) shuffles
    over the candidate edge list, which LSH has already bounded."""
    from ..operators.clustering import connected_components
    from .text_pipeline import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    labels = connected_components(pairs, "id_a", "id_b")
    sizes = labels.groupBy("comp").agg(F.count("*").alias("comp_size"))
    return (
        labels.join(sizes, "comp")
        .select(
            F.col("node").cast("long").alias("doc_id"),
            F.col("comp").cast("long").alias("comp"),
            F.col("comp_size").cast("long").alias("comp_size"),
        )
    )
