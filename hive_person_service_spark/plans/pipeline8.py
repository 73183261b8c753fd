"""Batch 9 — scale-pipeline widening (round 2):

- text_winnowing: winnowing fingerprint selection (Schleimer et al.,
  SIGMOD'03 -- the MOSS algorithm): rightmost-min k-gram hash per sliding
  window, fully IN-ROW (zero shuffle; the 100 TB fingerprinting shape).
  Engine-agnostic hashes via md5 prefixes compared as strings.
- dedup_simhash_band_pairs: a fully oracle-checkable SimHash LSH pipeline:
  32-bit signatures from md5 hex-digit votes (identical arithmetic in both
  engines, unlike xxhash64), 4x8-bit banding, bucket equi-join, Hamming
  verification -- the banded near-dup shape with an exact SQL oracle.
- agg_weighted_median: weighted median per group via cumulative-weight
  windows (no exact weighted-percentile built-in in either engine).
- sample_importance: deterministic Bernoulli importance sampling by a
  quality weight (pure arithmetic hash -> reproducible across engines,
  runs, and partitionings).
- dataset_shard_manifest: deterministic hash-sharding with a per-shard
  manifest (counts + order-insensitive checksums) -- the training-data
  export contract a downstream loader validates against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

WINNOW_K = 3  # k-gram size
WINNOW_W = 4  # winnowing window (guarantee: gap between picks <= w)


@declare(
    "text_winnowing",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    kg AS (
      SELECT doc_id,
             [substr(md5(array_to_string(t[i:i+{WINNOW_K - 1}], ' ')), 1, 16)
              FOR i IN range(1, len(t) - {WINNOW_K - 2})] AS gs
      FROM tok WHERE len(t) >= {WINNOW_K}),
    win AS (
      SELECT doc_id, gs,
             [list_aggregate(gs[j:j+{WINNOW_W - 1}], 'min')
              FOR j IN range(1, len(gs) - {WINNOW_W - 2})] AS mins
      FROM kg WHERE len(gs) >= {WINNOW_W}),
    sel AS (
      SELECT doc_id,
             unnest([
               {{'fp': mins[j],
                 'pos': CAST(j - 1 + list_position(gs[j:j+{WINNOW_W - 1}], mins[j])
                        AS BIGINT)}}
               FOR j IN range(1, len(mins) + 1)]) AS s
      FROM win)
    SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM sel
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: md5-prefix hash per k-gram, then
    for every sliding window of w consecutive k-grams select the minimum
    hash (first-min tiebreak), dedup selections. Guarantees at least one
    shared fingerprint for any match of length >= w + k - 1 -- the
    plagiarism/near-dup detection primitive behind MOSS. Entirely in-row
    array expressions (transform/slice/array_min): ZERO shuffle at any
    corpus size; the fingerprint explode keys later joins. Hashes are md5
    prefixes compared as strings, so Spark and the SQL oracle agree
    bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_expr()
    # gs[i] = md5 prefix of the k-gram starting at token i (1-based slice)
    gs = F.transform(
        F.sequence(F.lit(1), F.size(t) - (WINNOW_K - 1)),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(t, i, WINNOW_K))), 1, 16
        ),
    )
    base = d.select("doc_id", gs.alias("gs")).where(
        F.size("gs") >= WINNOW_W
    )
    # Per-window min hash computed ONCE in a prior projection: HOF lambdas
    # get no common-subexpression elimination, so the single-expression
    # form sliced each window three times and min'd it twice (r11 opt
    # round). `ms[i]` (0-based) = min of gs[i+1 .. i+w] (1-based slice).
    ms = F.transform(
        F.sequence(F.lit(1), F.size("gs") - (WINNOW_W - 1)),
        lambda j: F.array_min(F.slice(F.col("gs"), j, WINNOW_W)),
    )
    staged = base.select("doc_id", "gs", ms.alias("ms"))
    # For window i (0-based): fp = ms[i], pos = absolute 0-based position
    # of the window's first occurrence of that min -- identical values to
    # the original j-1 + array_position(slice, array_min(slice)) form.
    sel = F.transform(
        F.col("ms"),
        lambda m, i: F.struct(
            m.alias("fp"),
            (
                i
                + F.array_position(
                    F.slice(F.col("gs"), i + F.lit(1), WINNOW_W), m
                )
            ).cast("long").alias("pos"),
        ),
    )
    return (
        staged.select("doc_id", F.explode(F.array_distinct(sel)).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


@declare(
    "dedup_simhash_band_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents),
    votes AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i < 32
                      THEN CASE WHEN substr(md5(w), i + 1, 1) >= '8'
                                THEN 1 ELSE -1 END
                      ELSE CASE WHEN substr(md5('#' || w), i - 31, 1) >= '8'
                                THEN 1 ELSE -1 END
                 END) AS v
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
      GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 AND i < 32
                      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo,
             SUM(CASE WHEN v > 0 AND i >= 32
                      THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS hi
      FROM votes GROUP BY doc_id),
    banded AS (
      SELECT doc_id, lo, hi, b,
             CASE b WHEN 0 THEN lo & 65535
                    WHEN 1 THEN (lo >> 16) & 65535
                    WHEN 2 THEN hi & 65535
                    ELSE (hi >> 16) & 65535 END AS band
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.lo AS la, a.hi AS ha,
                      bb.doc_id AS id_b, bb.lo AS lb, bb.hi AS hb
      FROM banded a JOIN banded bb
        ON a.b = bb.b AND a.band = bb.band AND a.doc_id < bb.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3
    """,
)
def dedup_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash LSH near-dup pairs, fully oracle-checkable: 64-bit
    TF-weighted signature where bit i is the sign of the per-occurrence
    vote sum on an md5 hex digit (md5 gives identical bits in Spark and
    DuckDB -- unlike the xxhash64-based dedup_simhash, which pytest covers
    instead; two salted md5s supply 64 digits, term frequency supplies the
    weighting that makes the fixture's shared-vocabulary docs separable).
    The signature is PACKED into two longs; bands are 4 x 16-bit chunks
    (65536 buckets per band -- measured 100x fewer collisions than 8-bit
    bands on this shared-vocab corpus, whose similar docs otherwise flood
    small band spaces); candidates meet ONLY through the (band_id,
    band_value) equi-join; verification is integer bit_count(xor), not
    per-character comparison. By pigeonhole any pair with hamming <= 3
    shares one of the 4 bands, so recall at threshold 3 is exact."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_expr()).alias("w"))
    # Deliberately hashes per occurrence: a digest-per-distinct-word
    # rewrite (tf groupBy + vocabulary join + weighted vote sums) measured
    # CONSISTENTLY SLOWER at sf0.1 (5.7s vs 4.1s interleaved best-of-3,
    # r11 optimization round) -- the extra (doc, word) shuffle and the
    # 64-column weighted re-aggregation cost more than the md5 calls they
    # save, and the direct groupBy(doc_id) partial-aggregates to one row
    # per doc per task, so its shuffle is already minimal.
    h1, h2 = F.md5("w"), F.md5(F.concat(F.lit("#"), F.col("w")))
    votes = [
        F.sum(
            F.when(F.substring(h1 if i < 32 else h2, (i % 32) + 1, 1) >= "8", 1)
            .otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    lo = sum(
        (
            F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(0)
            for i in range(1, 32)
        ),
        F.when(F.col("v_0") > 0, F.lit(1)).otherwise(0),
    ).cast("long")
    hi = sum(
        (
            F.when(F.col(f"v_{i + 32}") > 0, F.lit(1 << i)).otherwise(0)
            for i in range(1, 32)
        ),
        F.when(F.col("v_32") > 0, F.lit(1)).otherwise(0),
    ).cast("long")
    sig = agg.select("doc_id", lo.alias("lo"), hi.alias("hi"))
    band_val = [
        F.col("lo").bitwiseAND(F.lit(65535)),
        F.shiftright("lo", 16).bitwiseAND(F.lit(65535)),
        F.col("hi").bitwiseAND(F.lit(65535)),
        F.shiftright("hi", 16).bitwiseAND(F.lit(65535)),
    ]
    banded = sig.select(
        "doc_id",
        "lo",
        "hi",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("b"), band_val[b].alias("band"))
                for b in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", "lo", "hi", F.col("bb.b").alias("b"), F.col("bb.band").alias("band"))
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("lo").alias("la"),
        F.col("hi").alias("ha"), "b", "band",
    )
    bside = banded.select(
        F.col("doc_id").alias("id_b"), F.col("lo").alias("lb"),
        F.col("hi").alias("hb"), "b", "band",
    )
    cand = (
        a.join(bside, ["b", "band"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "la", "ha", "lb", "hb")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
        + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).cast("long")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 3)
    )


@declare(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber) AS cw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem)
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 2) AS wmedian
    FROM cum WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (l_extendedprice weighted by l_quantity) per return
    flag: cumulative-weight prefix sum over the value order, first value
    whose cumulative weight crosses half the total. Neither engine has an
    exact weighted percentile built in. Only 3 return flags exist, so a
    window PARTITIONed by flag funnels a third of the fact table through
    one task at scale -- the grouped two-phase prefix sum
    (operators/global_rank.py) keeps every task at one range partition
    instead; group totals are a 3-row broadcast. Quantities are integer-
    valued doubles, so the regrouped summation stays bit-exact."""
    from ..operators.global_rank import with_grouped_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    cum = with_grouped_prefix_sum(
        li.select(
            "l_returnflag", "l_extendedprice", "l_orderkey",
            "l_linenumber", "l_quantity",
        ),
        ["l_returnflag"],
        [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        "l_quantity",
        "cw",
    )
    totals = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("tw"))
    return (
        cum.join(F.broadcast(totals), "l_returnflag")
        .where(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("wmedian"))
    )


@declare(
    "sample_importance",
    oracle="""
    SELECT doc_id, n_chars,
           ROUND(LEAST(CAST(n_chars AS DOUBLE) / 558, 1.0), 6) AS weight
    FROM documents
    WHERE CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003
          < LEAST(CAST(n_chars AS DOUBLE) / 558, 1.0)
    """,
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli importance sampling: keep each document with
    probability proportional to a quality weight (here length-normalized),
    decided by pure integer arithmetic on the id (Knuth multiplicative
    hash mod a prime) -- identical across engines, runs, partitionings,
    and scales, unlike rand()-seeded sampling whose draw order is
    partition-dependent. Map-side only: no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars").cast("double") / 558, F.lit(1.0))
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)
    ).cast("double") / 1000003
    return (
        d.where(u < weight)
        .select("doc_id", "n_chars", F.round(weight, 6).alias("weight"))
    )


@declare(
    "dataset_shard_manifest",
    oracle="""
    SELECT CAST((doc_id * 2654435761) % 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id * doc_id) AS BIGINT) AS id_checksum
    FROM documents
    GROUP BY 1
    """,
)
def dataset_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sharding manifest: shard assignment by
    multiplicative hash (stable across engines/runs), per-shard row count,
    byte budget, and an order-insensitive id checksum. The export contract
    a training loader validates before consuming a sharded corpus; one
    map-side shuffle on the shard key, same key the physical write
    partitions by."""
    d = load_table(spark, sf_dir, "documents")
    shard = ((F.col("doc_id") * F.lit(2654435761)) % 16).cast("long")
    return (
        d.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.col("doc_id") * F.col("doc_id")).cast("long").alias("id_checksum"),
        )
    )
