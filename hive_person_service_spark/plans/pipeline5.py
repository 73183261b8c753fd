"""Pipeline batch 5 -- corpus-hygiene operators every web-scale training
build runs before tokenization (all oracle-checked):

- text_gopher_quality: the Gopher-style rule battery (Rae et al. 2021,
  "Scaling Language Models" §A1.1) as one map-side pass: word-count bounds,
  mean-word-length bounds, stopword presence, duplicate-bigram repetition
  gate, and the combined keep flag. Each rule is a column so downstream
  audits can see WHICH rule fired, not just that one did.
- text_line_dedup: corpus-level duplicated-line removal (the C4/CCNet
  boilerplate move): split each doc into fixed-width token "lines", count
  per-line document frequency corpus-wide, drop lines appearing in >=
  BOILER_DF distinct docs, and reassemble the cleaned text in order.
- text_url_blocklist: domain filtering against a blocklist dimension
  (config-as-data, broadcast): synthesize a deterministic URL per doc (the
  fixture corpus has none), regexp-extract the registered domain, and tag
  each doc with the block reason or 'ok'.

Scale notes (100 TB): all three are one scan + (for line-dedup) one
aggregation on the exploded lines whose group count is bounded by distinct
line text, not corpus size; the boilerplate set is tiny and broadcasts back.
The blocklist join broadcasts a config dimension -- never a shuffle of the
fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

# Gopher-style rule thresholds, tuned to be non-degenerate on the fixture
# corpus (10..99 words/doc, 31-word vocabulary): each flag fires both ways.
WC_MIN, WC_MAX = 20, 90
MWL_MIN, MWL_MAX = 3.0, 10.0
STOP_MIN = 2
REP_MAX = 0.06
_STOPWORDS = ("the", "a", "of", "and", "to")

# Line-dedup parameters: 4-token lines; a line is boilerplate when it occurs
# in >= 5 distinct documents (measured: 11 of ~6.5k distinct lines at
# sf0.01, 45 at sf0.1 -- a real minority at every SF).
LINE_TOKENS = 4
BOILER_DF = 5

_BLOCKLIST = [
    ("src3.example.com", "spam"),
    ("src7.example.com", "adult"),
    ("src13.example.com", "malware"),
    ("src19.example.com", "copyright"),
]


def gopher_keep() -> "F.Column":
    """The combined Gopher keep gate as a reusable Column over `text` --
    shared by the declared batch query and the streaming quality gate
    (streaming/jobs.py), so both paths apply identical semantics."""
    toks = tokens_expr()
    n = F.size(toks)
    mean_wlen = (F.length("text") - n + F.lit(1.0)) / n
    stop_count = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    rep_ratio = (
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / (n - 1)
    )
    return (
        (n >= WC_MIN)
        & (n <= WC_MAX)
        & (mean_wlen >= MWL_MIN)
        & (mean_wlen <= MWL_MAX)
        & (stop_count >= STOP_MIN)
        & (rep_ratio <= REP_MAX)
    )


@declare(
    "text_gopher_quality",
    oracle=f"""
    SELECT doc_id, n_words, stop_count,
           ROUND(mean_wlen, 6) AS mean_wlen,
           ROUND(rep_ratio, 6) AS rep_ratio,
           CAST(n_words BETWEEN {WC_MIN} AND {WC_MAX} AS BIGINT) AS wc_ok,
           CAST(mean_wlen BETWEEN {MWL_MIN} AND {MWL_MAX} AS BIGINT) AS mwl_ok,
           CAST(stop_count >= {STOP_MIN} AS BIGINT) AS stop_ok,
           CAST(rep_ratio <= {REP_MAX} AS BIGINT) AS rep_ok,
           CAST((n_words BETWEEN {WC_MIN} AND {WC_MAX})
                AND (mean_wlen BETWEEN {MWL_MIN} AND {MWL_MAX})
                AND stop_count >= {STOP_MIN}
                AND rep_ratio <= {REP_MAX} AS BIGINT) AS keep
    FROM (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             (length(text) - len(t) + 1.0) / len(t) AS mean_wlen,
             CAST(len(list_filter(t, x -> x IN {_STOPWORDS!r})) AS BIGINT)
                 AS stop_count,
             1.0 - CAST(len(list_distinct(
                     list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE)
                   / (len(t) - 1) AS rep_ratio
      FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents))
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules in ONE map-side pass, zero shuffles: every
    signal (word count, mean word length, stopword count, duplicate-bigram
    ratio) is a JVM higher-order-function expression over the token array,
    so the rule battery scales as a linear scan of corpus bytes. Rule flags
    are separate columns (auditable) plus the combined keep gate."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr()
    n = F.size(toks)
    mean_wlen = (F.length("text") - n + F.lit(1.0)) / n
    stop_count = F.size(
        F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    ).cast("long")
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
    )
    rep_ratio = F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / (n - 1)
    wc_ok = (n >= WC_MIN) & (n <= WC_MAX)
    mwl_ok = (mean_wlen >= MWL_MIN) & (mean_wlen <= MWL_MAX)
    stop_ok = stop_count >= STOP_MIN
    rep_ok = rep_ratio <= REP_MAX
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        stop_count.alias("stop_count"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(rep_ratio, 6).alias("rep_ratio"),
        wc_ok.cast("long").alias("wc_ok"),
        mwl_ok.cast("long").alias("mwl_ok"),
        stop_ok.cast("long").alias("stop_ok"),
        rep_ok.cast("long").alias("rep_ok"),
        (wc_ok & mwl_ok & stop_ok & rep_ok).cast("long").alias("keep"),
    )


@declare(
    "text_line_dedup",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, i AS pos,
             array_to_string(t[{LINE_TOKENS}*i+1:{LINE_TOKENS}*i+{LINE_TOKENS}],
                             ' ') AS line
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           unnest(generate_series(
             0, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS BIGINT) - 1)) AS g(i)),
    boiler AS (
      SELECT line FROM lines GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= {BOILER_DF}),
    flagged AS (
      SELECT l.doc_id, l.pos, l.line, b.line IS NULL AS keep
      FROM lines l LEFT JOIN boiler b ON l.line = b.line)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE keep),
                    '') AS cleaned
    FROM flagged GROUP BY doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-line removal (C4/CCNet boilerplate pass):
    token-chunk "lines" -> per-line document frequency -> drop lines in >=
    BOILER_DF docs -> reassemble in order. The only shuffle groups by line
    text (cardinality = distinct lines, not corpus rows); the boilerplate
    set joins back onto the exploded lines un-hinted (at web scale the
    duplicated-line table is itself large -- CCNet-style dedup tables run
    to billions of lines -- so the strategy stays AQE's call), and the
    final per-doc reassembly re-uses the doc_id partitioning."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr()
    n_lines = F.ceil(F.size(toks) / float(LINE_TOKENS)).cast("int")
    lines = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
                ),
            )
        ).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_DF)
        .select("line")
    )
    flagged = lines.join(
        boiler.withColumn("is_boiler", F.lit(True)), "line", "left"
    ).select("doc_id", "pos", "line", F.col("is_boiler").isNull().alias("keep"))
    kept_sorted = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "keep", "line"))),
        lambda x: x["keep"],
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.count_if("keep").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(kept_sorted, lambda x: x["line"]), " "
        ).alias("cleaned"),
    )


_BLOCK_SQL = " UNION ALL ".join(
    f"SELECT '{d}' AS domain, '{r}' AS reason" for d, r in _BLOCKLIST
)


@declare(
    "text_url_blocklist",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    blocklist AS ({_BLOCK_SQL})
    SELECT u.doc_id, u.url,
           regexp_extract(u.url, '^https://([^/]+)/', 1) AS domain,
           COALESCE(b.reason, 'ok') AS reason,
           CAST(b.reason IS NULL AS BIGINT) AS keep
    FROM urls u
    LEFT JOIN blocklist b
      ON regexp_extract(u.url, '^https://([^/]+)/', 1) = b.domain
    """,
)
def text_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filtering (the robots/safety-list gate): URL ->
    registered domain via regexp, then a BROADCAST left join against the
    blocklist dimension -- config-as-data, so list updates are a data change
    and the fact side never shuffles. The fixture corpus has no URLs, so a
    deterministic URL is synthesized per doc (same expression in the
    oracle, so the extract+join logic is what's checked)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    block = F.broadcast(
        spark.createDataFrame(_BLOCKLIST, "domain string, reason string")
    )
    urls = d.select("doc_id", url.alias("url")).withColumn(
        "domain", F.regexp_extract("url", "^https://([^/]+)/", 1)
    )
    return urls.join(block, "domain", "left").select(
        "doc_id",
        "url",
        "domain",
        F.coalesce("reason", F.lit("ok")).alias("reason"),
        F.col("reason").isNull().cast("long").alias("keep"),
    )
