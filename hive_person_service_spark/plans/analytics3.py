"""Analytics batch 3 -- corpus statistics + event-sequence modelling (all
oracle-checked):

- text_collocations_pmi: pointwise mutual information over corpus word
  bigrams (the collocation detector behind phrase mining / tokenizer merge
  candidates): unigram + bigram count tables, PMI = log2(P(ab)/(P(a)P(b))).
  The unigram table is vocabulary-sized, so both probability joins
  broadcast; the only big shuffles group by token/bigram text.
- text_zipf_fit: Zipf's-law fit of the corpus frequency-rank curve --
  regr_slope/intercept/r2 of log2(freq) on log2(rank) (slope ~ -1 on
  natural text; strong deviation = synthetic/templated corpus, which this
  fixture is). Output is ONE row from a vocabulary-sized input.
- events_markov: first-order Markov transition matrix over per-user event
  sequences (lag by event time): transition counts + row-normalized
  probabilities -- the sequence prior for sessionized behavior models.
- events_attribution: linear multi-touch attribution -- every purchase
  splits unit credit equally across the user's view/click touches in the
  preceding 7 days; per-channel (event_type) credit totals. The join is
  user-equi + time-range, so it shuffles on user_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

PMI_MIN_COUNT = 20
ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds


@declare(
    "text_collocations_pmi",
    oracle=f"""
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
    tot_u AS (SELECT SUM(cw) AS tu FROM uni),
    big AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS cg
      FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                         i -> t[i] || ' ' || t[i + 1])) AS g
            FROM tok)
      GROUP BY g HAVING COUNT(*) >= {PMI_MIN_COUNT}),
    tot_b AS (SELECT SUM(len(t) - 1) AS tb FROM tok)
    SELECT g AS bigram, cg AS n,
           FLOOR(log2((CAST(cg AS DOUBLE) / tb)
                      / ((CAST(a.cw AS DOUBLE) / tu)
                         * (CAST(b.cw AS DOUBLE) / tu))) * 1e6 + 0.5) / 1e6
             AS pmi
    FROM big
    JOIN uni a ON a.w = string_split(g, ' ')[1]
    JOIN uni b ON b.w = string_split(g, ' ')[2]
    CROSS JOIN tot_u CROSS JOIN tot_b
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram PMI: unigram/bigram count tables -> probability join ->
    log2 ratio (FLOOR-half-up 6dp). The unigram count table joins back
    un-hinted -- vocabulary grows with the corpus (Heaps law, web-scale
    typos/URLs), so the join strategy is AQE's call; both corpus totals
    come from ONE 1-row aggregate that rides along as a broadcast cross
    join -- no driver-side collect, no extra corpus passes."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr()
    tok = d.select(toks.alias("t"))
    uni = (
        tok.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cw"))
    )
    totals = tok.agg(
        F.sum(F.size("t")).alias("tu"), F.sum(F.size("t") - 1).alias("tb")
    )
    big = (
        tok.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat(
                        F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
                    ),
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("cg"))
        .where(F.col("cg") >= PMI_MIN_COUNT)
    )
    a = uni.select(F.col("w").alias("wa"), F.col("cw").alias("ca"))
    b = uni.select(F.col("w").alias("wb"), F.col("cw").alias("cb"))
    joined = (
        big.join(a, F.split("g", " ").getItem(0) == F.col("wa"))
        .join(b, F.split("g", " ").getItem(1) == F.col("wb"))
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log2(
        (F.col("cg").cast("double") / F.col("tb"))
        / (
            (F.col("ca").cast("double") / F.col("tu"))
            * (F.col("cb").cast("double") / F.col("tu"))
        )
    )
    return joined.select(
        F.col("g").alias("bigram"),
        F.col("cg").alias("n"),
        (F.floor(pmi * 1e6 + 0.5) / 1e6).alias("pmi"),
    )


@declare(
    "text_zipf_fit",
    oracle="""
    WITH uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM uni)
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND(regr_slope(log2(CAST(c AS DOUBLE)), log2(CAST(rk AS DOUBLE))), 4)
             AS slope,
           ROUND(regr_intercept(log2(CAST(c AS DOUBLE)),
                                log2(CAST(rk AS DOUBLE))), 4) AS intercept,
           ROUND(regr_r2(log2(CAST(c AS DOUBLE)), log2(CAST(rk AS DOUBLE))), 6)
             AS r2
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf fit: corpus unigram counts -> frequency rank -> OLS of log2
    freq on log2 rank. The regression runs over the vocabulary-sized
    relation (the heavy groupBy happened first), so the global window is
    over ~|V| rows, never corpus rows."""
    d = load_table(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(tokens_expr()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    ranked = uni.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "w")).alias("rk"),
    )
    lf, lr = F.log2(F.col("c").cast("double")), F.log2(F.col("rk").cast("double"))
    return ranked.agg(
        F.count("*").cast("long").alias("vocab"),
        F.round(F.regr_slope(lf, lr), 4).alias("slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


@declare(
    "events_markov",
    oracle="""
    WITH seq AS (
      SELECT event_type AS next_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_type
      FROM events),
    cnt AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6)
             AS p
    FROM cnt
    """,
)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag on (event-time, event_id), transition counts, row-normalized
    probabilities. The probability window runs on the 25-row transition
    matrix, not the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    )


@declare(
    "events_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS pus
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      FROM events WHERE event_type IN ('view', 'click')),
    touches AS (
      SELECT p.pid, t.event_type
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.tus >= p.pus - {ATTRIB_WINDOW_US} AND t.tus < p.pus),
    sized AS (
      SELECT pid, event_type,
             COUNT(*) OVER (PARTITION BY pid) AS n_touches
      FROM touches)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           ROUND(SUM(1.0 / n_touches), 6) AS credit
    FROM sized GROUP BY event_type
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits unit credit
    equally over the user's view/click touches in the prior 7 days.
    user-equi + time-range join (shuffles on user_id only); the credit
    window partitions by purchase id. Exact epoch-microsecond bounds."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.unix_micros("ts").alias("pus"),
    )
    ev2 = load_table(spark, sf_dir, "events")
    t = ev2.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"),
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    touches = p.join(
        t,
        (F.col("pu") == F.col("tu"))
        & (F.col("tus") >= F.col("pus") - ATTRIB_WINDOW_US)
        & (F.col("tus") < F.col("pus")),
    ).select("pid", "event_type")
    sized = touches.withColumn(
        "n_touches", F.count("*").over(Window.partitionBy("pid"))
    )
    return sized.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_touchpoints"),
        F.round(F.sum(1.0 / F.col("n_touches")), 6).alias("credit"),
    )
