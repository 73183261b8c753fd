"""Training-data pipeline batch 3 (SURVEY.md §2.J): PII scrubbing, mixture
weighting, repetition scoring, and a real binary-metadata pass over
multimodal blobs.

- text_pii_scrub: regexp-based redaction. The fixture corpus is synthetic
  word soup with no PII, so both engines deterministically inject an email
  and a phone number per row first (same string expression), then the Spark
  side scrubs with the patterns a real corpus pass would use. regexp_count
  verifies each redaction actually fired.
- dataset_mixture: per-source sampling weights as DATA (a broadcast-joined
  weights dim), not a CASE expression -- the shape a 100-source corpus
  config actually has. Reuses the md5-hex-bucket determinism of
  sample_stratified (engine-reproducible, seed-free).
- text_repetition: word-bigram repetition ratio per document, the cheap
  intra-doc quality gate (boilerplate/template detectors); 2-grams measured
  non-degenerate on the fixture (avg 3%, max 13% at sf0.01).
- multimodal_image_dims: synthesize PNG-headered blobs from doc_id, then
  parse width/height back out of the raw bytes (operators/multimodal.py).
  The oracle re-derives the dims arithmetically, so the match proves the
  byte-level round trip, not just the formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import png_dims, synth_png_assets
from ..sources import load_table
from .registry import declare

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

_ENRICH_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail-' || source"
    " || '.com or +1-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' now'"
)


@declare(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(enriched, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(enriched, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones
    FROM (SELECT doc_id, {_ENRICH_SQL} AS enriched FROM documents)
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace emails then phone numbers with typed
    placeholder tokens, and count what was redacted (the audit trail a
    compliance pipeline keeps). Pure map-side JVM regex -- no shuffle, no
    Python; at 100 TB this runs at scan speed and the counts aggregate into
    a per-source redaction report downstream. Patterns are RE2-compatible so
    Spark (Java regex) and DuckDB (RE2) agree."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("source"),
        F.lit(".com or +1-555-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
        F.lit(" now"),
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(enriched, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
        F.regexp_count(enriched, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(enriched, F.lit(_PHONE_RE)).alias("n_phones"),
    )


# src0..src19 cycle through mixture weights 1/4, 1/2, 3/4, 1.0 -- hex-bucket
# thresholds '40', '80', 'c0', and 'zz' (every 2-hex bucket sorts below
# 'zz', i.e. keep-all).
_MIX_WEIGHTS = [(f"src{i}", ["40", "80", "c0", "zz"][i % 4]) for i in range(20)]


@declare(
    "dataset_mixture",
    oracle=f"""
    WITH weights(source, thr) AS (VALUES
      {", ".join(f"('{s}', '{t}')" for s, t in _MIX_WEIGHTS)})
    SELECT doc_id, lang, source, bucket
    FROM (
      SELECT doc_id, lang, source, thr,
             substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2)
                 AS bucket
      FROM documents JOIN weights USING (source))
    WHERE bucket < thr
    """,
)
def dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture sampling: a corpus build's per-source weights (keep
    25% of src0, 50% of src1, ... 100% of src3, cycling) applied via
    deterministic md5 buckets. The weights live in a DataFrame joined
    broadcast -- config-as-data, so a 1000-source manifest is a parquet file,
    not a 1000-arm CASE -- and the hash bucket is seed-free, so re-runs and
    other engines reproduce the exact sample. Map-side only: broadcast join
    + filter, no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(_MIX_WEIGHTS, ["source", "thr"])
    bucket = F.substring(
        F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    return (
        docs.join(F.broadcast(weights), "source")
        .withColumn("bucket", bucket)
        .where(F.col("bucket") < F.col("thr"))
        .select("doc_id", "lang", "source", "bucket")
    )


@declare(
    "text_repetition",
    oracle="""
    SELECT doc_id, n_grams, n_distinct,
           ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS rep_ratio
    FROM (
      SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      GROUP BY doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word bigrams, the cheap
    boilerplate/template detector every corpus quality stack runs (high
    ratio => machine-generated or scraped-nav text). Bigrams are built with
    higher-order array functions (transform over a sequence of offsets --
    JVM-side, no UDF) and never leave the row AT ALL: both counts are
    per-document functions of the gram array (size / array_distinct), so
    the whole query is one map pass at scan speed -- no explode, no
    shuffle, at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    # Fully IN-ROW (r11 opt round): the counts are per-document functions
    # of the gram array, so size / array_distinct replace the former
    # explode + groupBy(doc_id) + countDistinct -- zero shuffles, zero
    # explodes, one map pass at scan speed (the corpus_signals_fused
    # shape). Same gram expression, exact integer counts -> identical
    # rows.
    # Degenerate-doc guard (r12, advisor item): the oracle's unnest drops
    # documents with NO grams (null text -> null gram array; the fixture
    # has none, but the in-row form would emit a null-count row for
    # them). size(gs) > 0 is null for a null array, so both degenerate
    # shapes drop -- exactly the explode+groupBy semantics.
    staged = docs.select("doc_id", grams.alias("gs")).where(F.size("gs") > 0)
    n_grams = F.size("gs").cast("long")
    n_distinct = F.size(F.array_distinct("gs")).cast("long")
    return staged.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.round(1.0 - n_distinct.cast("double") / n_grams, 6).alias(
            "rep_ratio"
        ),
    )


@declare(
    "multimodal_image_dims",
    oracle="""
    SELECT doc_id AS asset_id,
           64 + doc_id % 960 AS width,
           64 + (doc_id * 7) % 512 AS height
    FROM documents
    """,
)
def multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pass over opaque media blobs: synthesize PNG-headered
    binaries (deterministic dims from doc_id), then parse width/height back
    OUT OF THE BYTES (magic check + IHDR offsets; operators/multimodal.py).
    The oracle recomputes the dims arithmetically, so agreement proves the
    synth->binary->parse round trip. Both steps are Arrow-batched
    mapInPandas reading only blob prefixes -- the shape of a real
    "dimensions/duration/codec probe" over a 100 TB media lake, where the
    win is never materializing full payloads for a metadata-only query."""
    docs = load_table(spark, sf_dir, "documents")
    return png_dims(synth_png_assets(docs))


@declare(
    "text_feature_hash",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(token), 1, 8))::UBIGINT % 256 AS bucket,
           COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY 1, 2
    """,
)
def text_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens -> 256 hashed feature buckets with counts,
    the fixed-width bag-of-words featurization (HashingTF's semantics) in
    long form. md5-derived buckets make the features engine-reproducible --
    a model trained on them can be re-featurized anywhere (the same
    argument as the CMS/KMV sketches). One explode + one (doc, bucket)
    grouped pass; the feature space is fixed at 256 regardless of
    vocabulary, which is the entire point at 100 TB -- no vocabulary dict
    to build, broadcast, or keep consistent."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long") % 256
    )
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


@declare(
    "text_lm_score",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS g
      FROM toks),
    big AS (SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS c2
            FROM grams GROUP BY 1, 2),
    uni AS (SELECT g.w1 AS w1, COUNT(*) AS c1 FROM grams GROUP BY 1)
    SELECT doc_id,
           COUNT(*) AS n_grams,
           FLOOR(exp(-AVG(ln(CAST(c2 AS DOUBLE) / c1))) * 10000 + 0.5)
               / 10000.0 AS ppl_proxy
    FROM grams
    JOIN big ON g.w1 = big.w1 AND g.w2 = big.w2
    JOIN uni ON g.w1 = uni.w1
    GROUP BY doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: train a bigram language model ON the
    corpus itself (P(w2|w1) = count(w1 w2)/count(w1 _)) and score each
    document by exp(-mean log P) over its bigrams -- the KenLM-style
    fluency filter of corpus pipelines, self-contained (no external model).
    High proxy => improbable word sequences. One corpus-wide bigram
    aggregate builds the model (head counts c1 derive from the model
    itself -- sum of its head's bigram counts -- not a second corpus
    pass); the persisted gram relation is exploded once and joins the
    enriched model as ONE plain equi-join -- bigram types grow
    near-linearly with corpus size, so the join strategy is left to
    AQE/statistics (broadcast at small scale, shuffle at web scale)
    rather than forced. ln/exp are transcendental, so the score is half-up-rounded
    to 4 via the engine-proof FLOOR(x*1e4+0.5) idiom; the AVG over exact
    count ratios is the one accumulation risk and stays within rounding
    tolerance at every fixture SF (verified)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    from ..operators.caching import persist_bounded

    grams = persist_bounded(
        "lm_score_grams",
        docs.select("doc_id", F.explode(pairs).alias("g")).select(
            "doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
        ),
    )  # feeds the model aggregate AND the scoring join: one
    # tokenize+explode pass instead of two (at 100 TB: a parquet staging
    # table, the dedup_ngram_jaccard discipline); bounded slot so a long
    # session never accumulates stale gram caches (guide §5)
    big = grams.groupBy(
        F.col("w1").alias("bw1"), F.col("w2").alias("bw2")
    ).agg(F.count("*").alias("c2"))
    # head counts derive from the MODEL relation (c1 = sum of its head's
    # bigram counts -- exact integers), not from a second corpus-wide
    # aggregate over the exploded gram relation; attaching c1 to the model
    # first also turns the two corpus-side joins into one (the model join
    # stays un-hinted: bigram types grow with corpus size, AQE decides)
    uni = big.groupBy(F.col("bw1").alias("uw1")).agg(F.sum("c2").alias("c1"))
    model = big.join(uni, F.col("bw1") == F.col("uw1")).select(
        "bw1", "bw2", "c2", "c1"
    )
    scored = (
        grams.join(
            model,
            (F.col("w1") == F.col("bw1")) & (F.col("w2") == F.col("bw2")),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.avg(F.log(F.col("c2").cast("double") / F.col("c1"))).alias("nll"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        (F.floor(F.exp(-F.col("nll")) * 10000 + 0.5) / 10000.0).alias("ppl_proxy"),
    )
