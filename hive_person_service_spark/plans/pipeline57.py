"""Round-8 continuation analytics batch: t-closeness, Mann-Whitney, ACF.

* ``privacy_t_closeness`` -- the third leg of the privacy triad next to
  k-anonymity (pipeline45) and l-diversity (pipeline32): per
  quasi-identifier group, the total-variation distance between the
  group's sensitive-attribute distribution and the global one
  (categorical EMD = TVD), with the release gate flag.  Pure rational
  arithmetic over counts.

* ``stat_mannwhitney`` -- rank-based two-sample test (the
  non-parametric complement to events_ab_ztest's proportions z):
  Mann-Whitney U with average ranks for ties and the tie-corrected
  normal approximation, computed ENTIRELY from the value-level
  HISTOGRAM -- rank sums come from cumulative histogram counts, so the
  plan is one tiny-cell groupBy + a 50-row window, never a global sort
  of the fact table.  All rank sums are exact multiples of 0.5 and all
  tie terms exact BIGINTs, so the statistic is engine-identical.

* ``events_acf`` -- sample autocorrelation of the daily event-count
  series at lags 1..7 (the seasonality diagnostic feeding
  events_seasonal_anomaly): day-level compaction first, then a
  day-spine self-join per lag -- the windows run on ~#days rows, never
  the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_TCLOSE_ORACLE = """
WITH s AS MATERIALIZED (
  SELECT c_mktsegment AS seg,
         CAST(FLOOR((c_acctbal + 1000.0) / 2000.0) AS BIGINT) AS band
  FROM customer),
gb AS (SELECT seg, band, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1, 2),
g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS tg FROM s GROUP BY 1),
b AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS cb FROM s GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
p AS (
  SELECT g.seg, g.tg, b.band,
         CAST(COALESCE(gb.c, 0) AS DOUBLE) / g.tg AS pg,
         CAST(b.cb AS DOUBLE) / (SELECT n FROM t) AS pa
  FROM g CROSS JOIN b
  LEFT JOIN gb ON gb.seg = g.seg AND gb.band = b.band)
SELECT seg, MIN(tg) AS n_cust,
       ROUND(SUM(ABS(pg - pa)) / 2.0, 6) AS tvd,
       CAST(ROUND(SUM(ABS(pg - pa)) / 2.0, 6) <= 0.05 AS BOOLEAN)
         AS meets_t
FROM p GROUP BY seg
"""


@declare("privacy_t_closeness", oracle=_TCLOSE_ORACLE)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit: for each market-segment QI group, the
    total-variation distance between its account-balance-band
    distribution and the global one, plus the t<=0.05 release flag --
    the check that catches a group whose SENSITIVE values skew even
    when k-anonymity and l-diversity pass.  One grouped pass builds
    the (group, band) histogram; the distance join runs on
    #groups x #bands rows."""
    s = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.floor((F.col("c_acctbal") + 1000.0) / 2000.0)
        .cast("long")
        .alias("band"),
    )
    gb = s.groupBy("seg", "band").agg(F.count("*").alias("c"))
    g = s.groupBy("seg").agg(F.count("*").alias("tg"))
    b = s.groupBy("band").agg(F.count("*").alias("cb"))
    n = s.agg(F.count("*").alias("n"))
    p = (
        g.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(n))
        .join(gb, ["seg", "band"], "left")
        .select(
            "seg",
            "tg",
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("tg")).alias("pg"),
            (F.col("cb").cast("double") / F.col("n")).alias("pa"),
        )
    )
    tvd = F.round(F.sum(F.abs(F.col("pg") - F.col("pa"))) / 2.0, 6)
    return p.groupBy("seg").agg(
        F.min("tg").alias("n_cust"),
        tvd.alias("tvd"),
        (tvd <= 0.05).alias("meets_t"),
    )


_MWU_ORACLE = """
WITH h AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS nr,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS na
  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
c AS (
  SELECT v, nr, na, nr + na AS nv,
         CAST(COALESCE(SUM(nr + na) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM h),
r AS (
  SELECT CAST(SUM(nr) AS BIGINT) AS n1, CAST(SUM(na) AS BIGINT) AS n2,
         SUM(nr * (cum_before + (nv + 1) / 2.0)) AS r1,
         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS ties
  FROM c)
SELECT n1, n2,
       r1 - n1 * (n1 + 1) / 2.0 AS u,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((n1 + n2 + 1)
                       - CAST(ties AS DOUBLE)
                         / ((n1 + n2) * (n1 + n2 - 1.0)))), 4) AS z
FROM r
"""


@declare("stat_mannwhitney", oracle=_MWU_ORACLE)
def stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U: does returned ('R') lineitem quantity stochastically
    differ from delivered ('N')?  Rank sums computed from the 50-cell
    quantity HISTOGRAM (cumulative counts -> average tie ranks), so the
    whole test is one small groupBy + a 50-row window -- the scale-safe
    formulation of a rank test (a naive one global-sorts the fact
    table).  Rank sums are exact multiples of 0.5 and the tie correction
    an exact BIGINT, so U and the tie-corrected z are engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    h = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("na"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c = h.select(
        "v",
        "nr",
        "na",
        (F.col("nr") + F.col("na")).alias("nv"),
        F.coalesce(
            F.sum(F.col("nr") + F.col("na")).over(w), F.lit(0)
        ).cast("long").alias("cum_before"),
    )
    r = c.agg(
        F.sum("nr").alias("n1"),
        F.sum("na").alias("n2"),
        F.sum(
            F.col("nr") * (F.col("cum_before") + (F.col("nv") + 1) / 2.0)
        ).alias("r1"),
        F.sum(
            F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv")
        ).cast("long").alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        n1d * F.col("n2") / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties").cast("double")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1.0))
        )
    )
    return r.select(
        "n1",
        "n2",
        u.alias("u"),
        F.round((u - n1d * F.col("n2") / 2.0) / sigma, 4).alias("z"),
    )


ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH d AS MATERIALIZED (
  SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
m AS (SELECT SUM(x) / COUNT(*) AS mean,
             SUM((x - (SELECT SUM(x) / COUNT(*) FROM d))
                 * (x - (SELECT SUM(x) / COUNT(*) FROM d))) AS den
      FROM d),
lags AS (SELECT CAST(k AS BIGINT) AS lag FROM range(1, {ACF_MAX_LAG + 1}) t(k))
SELECT l.lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM((a.x - m.mean) * (b.x - m.mean)) / MIN(m.den), 6) AS r
FROM lags l
JOIN d a ON TRUE
JOIN d b ON b.day = a.day + l.lag
CROSS JOIN m
GROUP BY l.lag
"""


@declare("events_acf", oracle=_ACF_ORACLE)
def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample AUTOCORRELATION of the daily event-count series at lags
    1..7 -- the weekly-seasonality diagnostic.  The event stream
    compacts to one row per day FIRST; the per-lag self-join and both
    moment passes run on that ~#days relation, so the plan's heavy side
    is a single groupBy(day) scan regardless of stream volume."""
    ev = load_table(spark, sf_dir, "events")
    from ..operators.caching import persist_bounded

    d = persist_bounded(
        "acf_daily",
        ev.groupBy(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("day")
        ).agg(F.count("*").alias("x")),
    )
    m = d.agg(
        (F.sum("x") / F.count("*")).alias("mean")
    )
    den = d.crossJoin(F.broadcast(m)).agg(
        F.sum((F.col("x") - F.col("mean")) * (F.col("x") - F.col("mean"))).alias("den"),
        F.first("mean").alias("mean"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .crossJoin(F.broadcast(den))
    )
    out = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum((F.col("xa") - F.col("mean")) * (F.col("xb") - F.col("mean")))
            / F.min("den"),
            6,
        ).alias("r"),
    )
    return out


_KW_ORACLE = """
WITH h AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag AS g,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2),
vt AS (
  SELECT v, CAST(SUM(n) AS BIGINT) AS nv FROM h GROUP BY v),
c AS (
  SELECT v, nv,
         CAST(COALESCE(SUM(nv) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM vt),
rj AS (
  SELECT h.g, CAST(SUM(h.n) AS BIGINT) AS nj,
         SUM(h.n * (c.cum_before + (c.nv + 1) / 2.0)) AS r
  FROM h JOIN c USING (v) GROUP BY h.g),
tot AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS n,
         SUM(r * r / nj) AS s,
         (SELECT CAST(SUM(nv * nv * nv - nv) AS BIGINT) FROM vt) AS ties
  FROM rj)
SELECT n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rj) AS k_groups,
       ROUND(12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1), 4) AS h,
       ROUND((12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1))
             / (1.0 - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * n * n - n)), 4) AS h_tie_corrected
FROM tot
"""


@declare("stat_kruskal", oracle=_KW_ORACLE)
def stat_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H across the three return-flag cohorts (the k-group
    generalization of stat_mannwhitney): per-group rank sums from the
    SAME value-level histogram machinery -- cumulative counts give
    average tie ranks, so k-sample rank testing costs one tiny-cell
    groupBy + a 50-row window at any data size.  Tie-corrected H
    alongside raw H; rank sums exact half-integers, tie term exact
    BIGINT, so both statistics are engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_quantity").cast("long").alias("v"),
        F.col("l_returnflag").alias("g"),
    ).agg(F.count("*").alias("n"))
    vt = h.groupBy("v").agg(F.sum("n").alias("nv"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c = vt.select(
        "v",
        "nv",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    rj = (
        h.join(c, "v")
        .groupBy("g")
        .agg(
            F.sum("n").alias("nj"),
            F.sum(
                F.col("n") * (F.col("cum_before") + (F.col("nv") + 1) / 2.0)
            ).alias("r"),
        )
    )
    ties = vt.agg(
        F.sum(
            F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv")
        ).cast("long").alias("ties")
    )
    tot = rj.agg(
        F.sum("nj").alias("n"),
        F.count("*").alias("k_groups"),
        F.sum(F.col("r") * F.col("r") / F.col("nj")).alias("s"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n")
    h_stat = 12.0 / (nd * (nd + 1.0)) * F.col("s") - 3.0 * (nd + 1)
    return tot.select(
        "n",
        "k_groups",
        F.round(h_stat, 4).alias("h"),
        F.round(
            h_stat
            / (
                1.0
                - F.col("ties").cast("double")
                / (nd.cast("double") * nd * nd - nd)
            ),
            4,
        ).alias("h_tie_corrected"),
    )
