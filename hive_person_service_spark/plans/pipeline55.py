"""Round-8 continuation ML batch: boosted stumps, rank-2 ALS, Kneser-Ney.

* ``ml_train_gbt`` -- GRADIENT-BOOSTED decision stumps (the
  XGBoost/LightGBM primitive) trained end to end and oracle-checked:
  3 forward-stagewise rounds, each searching EVERY candidate split of
  two features via per-feature HISTOGRAMS (groupBy feature value ->
  cumulative sums -> variance-reduction argmax), then subtracting the
  fitted leaf means from the residuals.  The entire fit runs in exact
  INTEGER micro-units (prices floor-half-up quantized to micros, leaf
  means floored to micros), so every histogram sum is a BIGINT with no
  accumulation-order surface, the split scores are IEEE-identical
  doubles of exact integers, and the DuckDB oracle replays the
  identical rounds as unrolled MATERIALIZED CTEs -- an iterative
  boosted-tree fit certified cross-engine.

* ``ml_train_als2`` -- rank-2 ALS: each half-step solves a per-key
  2x2 normal equation in closed form (Cramer) from INTEGER sufficient
  statistics (factors quantized to BIGINT micros, ratings to cents, so
  the five per-key sums are exact), then floor-half-up requantizes.
  Tightens ml_train_als's rank-1 showcase to a true multi-factor
  alternating solve with the same unrolled-CTE oracle.

* ``text_kneser_ney_logprob`` -- interpolated Kneser-Ney bigram LM
  scoring (absolute discount D=0.75, continuation-count backoff), the
  standard KenLM smoothing next to text_bigram_logprob's raw MLE;
  same DECIMAL-quanta / FLOOR-mean scale-invariance discipline.

Scale shapes: the GBT histogram pass is one shuffle per feature on the
feature VALUE (50 + 11 cells -- the leaf-wise histogram trick: split
search cost is bounded by bins, never rows); ALS is one shuffle per
half-step on the solved-for key; KN is the bigram groupBy + two
un-hinted model joins (AQE broadcasts when the model fits, shuffles
on the bigram key when it doesn't -- bigram types grow with corpus
size, so the hint is never forced).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

GBT_ROUNDS = 3

_GBT_BASE = """
base AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000 AS y
  FROM lineitem),
m0 AS (SELECT CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu0,
              CAST(COUNT(*) AS BIGINT) AS n FROM base),
t1 AS MATERIALIZED (SELECT q, d, y - (SELECT mu0 FROM m0) AS res FROM base)
"""


def _gbt_round_sql(r: int) -> str:
    """CTEs for boosting round r: histogram -> cumulative -> best split
    -> residual update.  All sums BIGINT-exact; scores are doubles of
    exact integers (deterministic IEEE)."""
    return f"""h{r} AS MATERIALIZED (
  SELECT 'd' AS f, d AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM t{r} GROUP BY d
  UNION ALL
  SELECT 'q' AS f, q AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM t{r} GROUP BY q),
c{r} AS MATERIALIZED (
  SELECT f, x AS thr,
         CAST(SUM(n) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS nl,
         CAST(SUM(s) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS sl,
         CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS nt,
         CAST(SUM(s) OVER (PARTITION BY f) AS BIGINT) AS st
  FROM h{r}),
b{r} AS MATERIALIZED (
  SELECT f, thr,
         CAST(FLOOR(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS mul,
         CAST(FLOOR(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT) AS mur,
         ROUND((CAST(sl AS DOUBLE) * sl / nl
              + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)) / 1e12,
               4) AS gain
  FROM c{r} WHERE nl < nt
  ORDER BY gain DESC, f, thr LIMIT 1),
t{r + 1} AS MATERIALIZED (
  SELECT q, d,
         res - CASE WHEN (b.f = 'q' AND t.q <= b.thr)
                      OR (b.f = 'd' AND t.d <= b.thr)
                    THEN b.mul ELSE b.mur END AS res
  FROM t{r} t CROSS JOIN b{r} b)"""


def _gbt_oracle(rounds: int) -> str:
    ctes = [_GBT_BASE.strip()]
    ctes.extend(_gbt_round_sql(r) for r in range(1, rounds + 1))
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round, b.f AS feature, b.thr AS threshold,
       b.mul AS mu_left, b.mur AS mu_right, b.gain,
       (SELECT ROUND(SQRT(CAST(SUM(CAST(res AS DECIMAL(19,0))
                                 * CAST(res AS DECIMAL(19,0))) AS DOUBLE)
                          / COUNT(*)) / 1e6, 4)
        FROM t{r + 1}) AS rmse
FROM b{r} b"""
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("ml_train_gbt", oracle=_gbt_oracle(GBT_ROUNDS))
def ml_train_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted stump TRAINING, oracle-checked end to end:
    predict lineitem price from (quantity, discount%) by 3 forward-
    stagewise rounds; each round builds per-feature residual HISTOGRAMS
    (50 + 11 cells), scans every cumulative split for the best variance
    reduction (gain DESC, feature, threshold tiebreak), and subtracts
    the fitted leaf means.  Exact integer micro-unit residuals keep the
    whole trajectory reproducible; output = (round, feature, threshold,
    mu_left, mu_right, gain, rmse) -- the boosting curve itself is the
    hash-checked result.  At 100 TB the split search moves only
    #bins accumulators per round (the histogram trick); the residual
    update is a map-side CASE against two broadcast scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d"),
        (
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            * 10000
        ).alias("y"),
    )
    tot = base.agg(
        F.sum("y").alias("sy"), F.count("*").alias("n")
    ).collect()[0]
    n_rows = int(tot["n"])
    # FLOOR(CAST(sum AS DOUBLE) / n): float() rounds to nearest double
    # exactly like both engines' BIGINT->DOUBLE cast
    mu0 = math.floor(float(int(tot["sy"])) / n_rows)
    t = base.select("q", "d", (F.col("y") - F.lit(mu0)).alias("res")).cache()

    out: list[tuple] = []
    rdec = F.col("res").cast("decimal(19,0)")
    rmse_agg_expr = F.round(
        F.sqrt(F.sum(rdec * rdec).cast("double") / F.count("*")) / 1e6, 4
    ).alias("rmse")
    # round r's rmse is an aggregate over t_{r+1} -- the SAME relation round
    # r+1's histograms read. Deferring it into round r+1's split-search
    # action (a 1-row crossJoin) halves the per-round driver actions; the
    # final round's rmse is the only one that still needs its own action.
    pending: tuple | None = None  # (round, f, thr, mul, mur, gain)
    prev_t = None  # t_{r-1}: stays cached until the action materializing t_r
    for r in range(1, GBT_ROUNDS + 1):
        # Both feature histograms in ONE pass over t (GROUPING SETS ->
        # a single Expand + aggregate, one exchange of <= 61 cells) instead
        # of a union of two separate groupBys (two scans of the cached
        # residual relation, two exchanges). Counts/sums are exact BIGINTs,
        # so the regrouping cannot move a value.
        gid = F.grouping_id()
        h = (
            t.groupingSets([[F.col("d")], [F.col("q")]], F.col("d"), F.col("q"))
            .agg(
                F.count("*").alias("n"),
                F.sum("res").alias("s"),
                gid.alias("gid"),
            )
            .select(
                F.when(F.col("gid") == 1, F.lit("d")).otherwise(F.lit("q")).alias("f"),
                F.when(F.col("gid") == 1, F.col("d")).otherwise(F.col("q")).alias("x"),
                "n",
                "s",
            )
        )
        w_cum = Window.partitionBy("f").orderBy("x")
        w_all = Window.partitionBy("f")
        c = h.select(
            "f",
            F.col("x").alias("thr"),
            F.sum("n").over(w_cum).alias("nl"),
            F.sum("s").over(w_cum).alias("sl"),
            F.sum("n").over(w_all).alias("nt"),
            F.sum("s").over(w_all).alias("st"),
        ).where(F.col("nl") < F.col("nt"))
        sl_d = F.col("sl").cast("double")
        sr_d = (F.col("st") - F.col("sl")).cast("double")
        nr = F.col("nt") - F.col("nl")
        scored = c.select(
            "f",
            "thr",
            F.floor(sl_d / F.col("nl")).cast("long").alias("mul"),
            F.floor(sr_d / nr).cast("long").alias("mur"),
            F.round(
                (sl_d * F.col("sl") / F.col("nl") + sr_d * (F.col("st") - F.col("sl")) / nr)
                / 1e12,
                4,
            ).alias("gain"),
        )
        # bounded driver read: the single best split row (+ the previous
        # round's 1-row rmse aggregate when one is pending)
        best_q = scored.orderBy(F.col("gain").desc(), "f", "thr").limit(1)
        if pending is None:
            best = best_q.collect()[0]
        else:
            best = best_q.crossJoin(t.agg(rmse_agg_expr)).collect()[0]
            out.append((*pending, float(best["rmse"])))
        if prev_t is not None:
            prev_t.unpersist()
        f_, thr = best["f"], int(best["thr"])
        mul, mur = int(best["mul"]), int(best["mur"])
        hit = F.col(f_) <= F.lit(thr)
        t_new = t.select(
            "q",
            "d",
            (F.col("res") - F.when(hit, F.lit(mul)).otherwise(F.lit(mur))).alias(
                "res"
            ),
        ).cache()
        pending = (r, f_, thr, mul, mur, float(best["gain"]))
        prev_t = t
        t = t_new
    rmse = t.agg(rmse_agg_expr).collect()[0]["rmse"]
    out.append((*pending, float(rmse)))
    if prev_t is not None:
        prev_t.unpersist()
    t.unpersist()
    return spark.createDataFrame(
        out,
        "round bigint, feature string, threshold bigint, mu_left bigint, "
        "mu_right bigint, gain double, rmse double",
    )


# ---------------------------------------------------------------------------
# rank-2 ALS: per-key 2x2 Cramer solves from INTEGER sufficient statistics
# ---------------------------------------------------------------------------

ALS2_ROUNDS = 3

_ALS2_BASE = """
r AS MATERIALIZED (
  SELECT o_custkey AS u, l_partkey AS i,
         CAST(FLOOR(AVG(l_quantity) * 100 + 0.5) AS BIGINT) AS rc
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
q0 AS MATERIALIZED (
  SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS f1,
         (i % 11) * 100000 - 500000 AS f2
  FROM r)
"""


def _als2_half_sql(out: str, key: str, other: str, src: str, prev: str) -> str:
    """One ALS half-step: solve the 2x2 regularized normal equation per
    ``key`` from exact integer sums over the ``prev`` factor side, then
    floor-half-up requantize to BIGINT micros."""
    return f"""{out} AS MATERIALIZED (
  SELECT {key},
         CAST(FLOOR((b1 * a22 - b2 * a12)
                    / (a11 * a22 - a12 * a12) * 1e6 + 0.5) AS BIGINT) AS f1,
         CAST(FLOOR((a11 * b2 - a12 * b1)
                    / (a11 * a22 - a12 * a12) * 1e6 + 0.5) AS BIGINT) AS f2
  FROM (
    SELECT {key},
           0.1 + CAST(SUM(f1 * f1) AS DOUBLE) / 1e12 AS a11,
           CAST(SUM(f1 * f2) AS DOUBLE) / 1e12 AS a12,
           0.1 + CAST(SUM(f2 * f2) AS DOUBLE) / 1e12 AS a22,
           CAST(SUM(f1 * rc) AS DOUBLE) / 1e8 AS b1,
           CAST(SUM(f2 * rc) AS DOUBLE) / 1e8 AS b2
    FROM {src} JOIN {prev} USING ({other}) GROUP BY {key}) s)"""


def _als2_oracle(rounds: int) -> str:
    ctes = [_ALS2_BASE.strip()]
    for n in range(1, rounds + 1):
        ctes.append(_als2_half_sql(f"p{n}", "u", "i", "r", f"q{n - 1}"))
        ctes.append(_als2_half_sql(f"q{n}", "i", "u", "r", f"p{n}"))
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({n} AS BIGINT) AS round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p{n}) AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM q{n}) AS n_items,
       (SELECT ROUND(CAST(SUM(f1) AS DOUBLE) / COUNT(*) / 1e6, 4) FROM p{n}) AS avg_p1,
       (SELECT ROUND(CAST(SUM(f2) AS DOUBLE) / COUNT(*) / 1e6, 4) FROM p{n}) AS avg_p2,
       ROUND(SQRT(CAST(SUM(CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0)))
                       AS DOUBLE) / COUNT(*)) / 1e6, 6) AS rmse
FROM (
  SELECT r.rc * 10000
         - CAST(FLOOR((CAST(p.f1 AS DOUBLE) * q.f1
                       + CAST(p.f2 AS DOUBLE) * q.f2) / 1e6 + 0.5) AS BIGINT)
           AS e
  FROM r JOIN p{n} p USING (u) JOIN q{n} q USING (i)) t"""
        for n in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("ml_train_als2", oracle=_als2_oracle(ALS2_ROUNDS))
def ml_train_als2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-2 alternating least squares over the customer x part rating
    matrix, oracle-checked: each half-step solves a per-key 2x2 ridge
    normal equation in closed form (Cramer) from five EXACT INTEGER
    sufficient statistics (factors live as BIGINT micros, ratings as
    cents, so the grouped sums have no accumulation-order surface at
    all -- stronger than the rank-1 query's rounded-double sums), then
    floor-half-up requantizes.  Output = per-round factor summary +
    RMSE curve.  Scale shape: one shuffle per half-step on the
    solved-for key; 5 BIGINT accumulators per key; only curve scalars
    reach the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(
            F.floor(F.avg("l_quantity") * 100 + 0.5).cast("long").alias("rc")
        )
        .cache()
    )
    q = r.select("i").distinct().select(
        "i",
        F.lit(1000000).cast("long").alias("f1"),
        ((F.col("i") % 11) * 100000 - 500000).cast("long").alias("f2"),
    ).cache()

    def half(key: str, other: str, prev: DataFrame) -> DataFrame:
        s = (
            r.join(prev, other)
            .groupBy(key)
            .agg(
                (
                    F.lit(0.1)
                    + F.sum(F.col("f1") * F.col("f1")).cast("double") / F.lit(1e12)
                ).alias("a11"),
                (F.sum(F.col("f1") * F.col("f2")).cast("double") / F.lit(1e12)).alias("a12"),
                (
                    F.lit(0.1)
                    + F.sum(F.col("f2") * F.col("f2")).cast("double") / F.lit(1e12)
                ).alias("a22"),
                (F.sum(F.col("f1") * F.col("rc")).cast("double") / F.lit(1e8)).alias("b1"),
                (F.sum(F.col("f2") * F.col("rc")).cast("double") / F.lit(1e8)).alias("b2"),
            )
        )
        det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
        return s.select(
            key,
            F.floor(
                (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det * 1e6
                + 0.5
            ).cast("long").alias("f1"),
            F.floor(
                (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det * 1e6
                + 0.5
            ).cast("long").alias("f2"),
        )

    out: list[tuple] = []
    for n in range(1, ALS2_ROUNDS + 1):
        p = half("u", "i", q).cache()
        new_q = half("i", "u", p).cache()
        # ONE driver action per round (was three: p-stats collect, a
        # new_q.count() job, and the rmse collect): crossJoin the 1-row
        # aggregates so all subtrees run in a single job submission.
        # Every aggregate is over EXACT integer sums, so merging the
        # actions cannot move a value.
        ps = p.agg(
            F.count("*").alias("n_users"),
            F.round(F.sum("f1").cast("double") / F.count("*") / F.lit(1e6), 4).alias("a1"),
            F.round(F.sum("f2").cast("double") / F.count("*") / F.lit(1e6), 4).alias("a2"),
        )
        qs = new_q.agg(F.count("*").alias("n_items"))
        pred = F.floor(
            (F.col("pf1").cast("double") * F.col("f1")
             + F.col("pf2").cast("double") * F.col("f2")) / F.lit(1e6)
            + 0.5
        ).cast("long")
        e = (F.col("rc") * 10000 - pred).alias("e")
        edec = F.col("e").cast("decimal(19,0)")
        rm = (
            r.join(p.select("u", F.col("f1").alias("pf1"), F.col("f2").alias("pf2")), "u")
            .join(new_q, "i")
            .select(e)
            .agg(
                F.round(
                    F.sqrt(F.sum(edec * edec).cast("double") / F.count("*")) / F.lit(1e6),
                    6,
                ).alias("rmse")
            )
        )
        row = ps.crossJoin(qs).crossJoin(rm).collect()[0]
        out.append(
            (n, int(row["n_users"]), int(row["n_items"]), float(row["a1"]),
             float(row["a2"]), float(row["rmse"]))
        )
        q.unpersist()
        q = new_q
        p.unpersist()
    q.unpersist()
    r.unpersist()
    return spark.createDataFrame(
        out,
        "round bigint, n_users bigint, n_items bigint, "
        "avg_p1 double, avg_p2 double, rmse double",
    )


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram LM scoring
# ---------------------------------------------------------------------------

_KN_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '')
           AS ts
  FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM toks WHERE len(ts) >= 2),
counts AS MATERIALIZED (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY bg),
heads AS MATERIALIZED (
  SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1fw
  FROM counts GROUP BY 1),
conts AS MATERIALIZED (
  SELECT string_split(bg, ' ')[2] AS w2, CAST(COUNT(*) AS BIGINT) AS nbw
  FROM counts GROUP BY 1),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM counts),
model AS MATERIALIZED (
  SELECT c.bg,
         ROUND(LN((c.c12 - 0.75) / h.c1
                  + 0.75 * h.n1fw / h.c1
                    * (CAST(co.nbw AS DOUBLE) / (SELECT nb FROM bt))), 6)
           AS logp
  FROM counts c
  JOIN heads h ON string_split(c.bg, ' ')[1] = h.w1
  JOIN conts co ON string_split(c.bg, ' ')[2] = co.w2),
scored AS (
  SELECT b.doc_id,
         FLOOR(10000.0 * CAST(SUM(CAST(m.logp AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*)) / 10000.0 AS mean_logp,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams
  FROM bi b JOIN model m USING (bg) GROUP BY b.doc_id)
SELECT doc_id, mean_logp, n_bigrams FROM scored
"""


@declare("text_kneser_ney_logprob", oracle=_KN_ORACLE)
def text_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY bigram LM scoring (absolute discount
    D=0.75, continuation-count backoff -- the KenLM-standard smoothing):
    P(w2|w1) = max(c12-D,0)/c1 + D*N1+(w1 .)/c1 * N1+(. w2)/|bigrams|;
    per-doc mean log-prob with the DECIMAL-quanta / FLOOR-mean
    discipline of text_bigram_logprob, so the score is bit-identical at
    every sf.  Unlike the raw-MLE sibling, unseen-context mass is
    explicitly reserved -- the production fluency gate shape.  The
    model joins are un-hinted (bigram types grow with corpus size;
    AQE picks broadcast only when the model actually fits)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ts"),
    )
    bi = toks.where(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
            )
        ).alias("bg"),
    )
    counts = bi.groupBy("bg").agg(F.count("*").alias("c12"))
    heads = counts.groupBy(F.split("bg", " ")[0].alias("w1")).agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1fw")
    )
    conts = counts.groupBy(F.split("bg", " ")[1].alias("w2")).agg(
        F.count("*").alias("nbw")
    )
    nb = counts.agg(F.count("*").alias("nb"))
    model = (
        counts.join(heads, F.split(counts.bg, " ")[0] == heads.w1)
        .join(conts, F.split(counts.bg, " ")[1] == conts.w2)
        .crossJoin(F.broadcast(nb))
        .select(
            "bg",
            F.round(
                F.log(
                    (F.col("c12") - 0.75) / F.col("c1")
                    + F.lit(0.75) * F.col("n1fw") / F.col("c1")
                    * (F.col("nbw").cast("double") / F.col("nb"))
                ),
                6,
            ).alias("logp"),
        )
    )
    return (
        bi.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            (
                F.floor(
                    F.lit(10000.0)
                    * F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
                    / F.count("*")
                )
                / 10000.0
            ).alias("mean_logp"),
            F.count("*").alias("n_bigrams"),
        )
        .select("doc_id", "mean_logp", "n_bigrams")
    )
