"""Round-8 continuation: connected components + Gaussian naive Bayes.

* ``graph_wcc`` -- weakly-connected components by R synchronized
  min-label-propagation rounds over the customer referral forest
  (parent = floor(custkey / 7)).  Fixing the round count makes the
  whole propagation a finite relational expression, so the DuckDB
  oracle unrolls the identical rounds as MATERIALIZED CTEs (the
  graph_kcore_peel recipe) and the iterative component discovery is
  hash-checked cross-engine.  Everything is INTEGER arithmetic -- no
  float drift anywhere.

* ``ml_train_naive_bayes`` -- Gaussian naive-Bayes TRAINING and
  EVALUATION fully oracle-checked: the fit is purely aggregative
  (per-class feature means/variances + log-priors -- one grouped pass,
  the sufficient-statistics bound), so unlike the GD classifier it
  needs no iteration at all and the ENTIRE train->score->argmax->
  confusion-matrix pipeline is SQL-expressible.  Cross-engine drift is
  pinned the standard way: aggregate moments rounded to 6 (the only
  order-dependent sums), ln() applied only to those rounded constants
  (5 classes x 4 features of them, rounded to 6 again), per-row scores
  built from rounded constants + exact rational feature arithmetic,
  final score rounded to 6 with a class-name tiebreak.

Scale shape: WCC shuffles once per round on node id (degree-bounded
neighbor-min groupBy + one hash join), caching each round's labels and
unpersisting the previous -- lineage depth O(1) per round.  NB is two
scans: one grouped aggregate over (class), one broadcast of the
25-row parameter relation back over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

WCC_ROUNDS = 6

_WCC_BASE = """
e0 AS MATERIALIZED (
  SELECT c_custkey AS a, CAST(FLOOR(c_custkey / 7) AS BIGINT) AS b
  FROM customer WHERE c_custkey >= 7
    AND CAST(FLOOR(c_custkey / 7) AS BIGINT)
        IN (SELECT c_custkey FROM customer)),
s0 AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
l0 AS MATERIALIZED (SELECT c_custkey AS a, c_custkey AS lbl FROM customer)
"""


def _wcc_oracle(rounds: int) -> str:
    ctes = [_WCC_BASE.strip()]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT n.a, LEAST(n.lbl, COALESCE(m.mn, n.lbl)) AS lbl
  FROM l{p} n LEFT JOIN (
    SELECT s.a, MIN(l.lbl) AS mn
    FROM s0 s JOIN l{p} l ON s.b = l.a GROUP BY s.a) m
  ON n.a = m.a)"""
        )
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
       (SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) FROM l{r}) AS n_labels,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM l{r} c
        JOIN l{r - 1} q ON c.a = q.a AND c.lbl <> q.lbl) AS n_changed"""
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("graph_wcc", oracle=_wcc_oracle(WCC_ROUNDS))
def graph_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected components via 6 synchronized min-label
    propagation rounds over the symmetrized customer referral forest
    (child -> floor(key/7)); output = (round, n_labels, n_changed)
    convergence curve, hash-checked against a DuckDB replay of the
    identical rounds.  All-integer state: labels ARE node ids, so the
    propagation has no rounding surface at all."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    # WELL-FORMED edges only: floor(key/7) may miss the customer set
    # when keys are non-contiguous (the sf1 synthesis offsets replicas
    # by 10M), and a phantom endpoint must not enter the label relation
    e0 = (
        cust.where(F.col("c_custkey") >= 7)
        .select(
            F.col("c_custkey").alias("a"),
            F.floor(F.col("c_custkey") / 7).cast("long").alias("b"),
        )
        .join(cust.select(F.col("c_custkey").alias("b")), "b", "semi")
    )
    s0 = e0.unionByName(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()  # the loop's base relation: built once
    labels = cust.select(
        F.col("c_custkey").alias("a"), F.col("c_custkey").alias("lbl")
    ).cache()

    stats: list[tuple[int, int, int]] = []
    prev_cached = labels
    for r in range(1, WCC_ROUNDS + 1):
        # one round = ONE groupBy(a): the node's own label (carrying
        # prev) unioned with every neighbor's label, min-reduced --
        # no separate neighbor-min + left-join pair
        prop = s0.join(
            labels.select(F.col("a").alias("b"), "lbl"), "b"
        ).select("a", F.lit(None).cast("long").alias("prev"), "lbl")
        own = labels.select("a", F.col("lbl").alias("prev"), "lbl")
        new = (
            own.unionByName(prop)
            .groupBy("a")
            .agg(F.min("lbl").alias("lbl"), F.max("prev").alias("prev"))
            .cache()
        )
        # bounded driver read: 2 scalars per round, ONE action (the
        # prev label rides along so n_changed needs no second join)
        row = new.agg(
            F.countDistinct("lbl").alias("n"),
            F.sum((F.col("lbl") != F.col("prev")).cast("long")).alias("ch"),
        ).collect()[0]
        stats.append((r, int(row["n"]), int(row["ch"])))
        prev_cached.unpersist()
        prev_cached = new
        labels = new.select("a", "lbl")
        if int(row["ch"]) == 0:
            # fixpoint: no label moved, so every later round is the
            # identity -- emit the remaining curve without computing
            stats.extend(
                (j, int(row["n"]), 0) for j in range(r + 1, WCC_ROUNDS + 1)
            )
            break
    prev_cached.unpersist()
    s0.unpersist()
    return spark.createDataFrame(
        stats, "round bigint, n_labels bigint, n_changed bigint"
    )


# ---------------------------------------------------------------------------
# Gaussian naive Bayes: train + score + confusion matrix, oracle-checked
# ---------------------------------------------------------------------------

_NB_FEATURES_SQL = """
SELECT doc_id, lang,
       CAST(n_chars AS DOUBLE) / 100.0 AS f1,
       length(regexp_replace(text, '[^.,;:!?'']', '', 'g'))
         / CAST(n_chars AS DOUBLE) AS f2,
       CAST(n_chars AS DOUBLE)
         / (len(string_split(text, ' ')) + 1) AS f3,
       length(regexp_replace(text, '[^ ]', '', 'g'))
         / CAST(n_chars AS DOUBLE) AS f4
FROM documents
"""

_NB_ORACLE = f"""
WITH f AS MATERIALIZED ({_NB_FEATURES_SQL.strip()}),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM f),
p AS MATERIALIZED (
  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(AVG(f1), 6) AS m1, ROUND(AVG(f1 * f1), 6) AS s1,
         ROUND(AVG(f2), 6) AS m2, ROUND(AVG(f2 * f2), 6) AS s2,
         ROUND(AVG(f3), 6) AS m3, ROUND(AVG(f3 * f3), 6) AS s3,
         ROUND(AVG(f4), 6) AS m4, ROUND(AVG(f4 * f4), 6) AS s4
  FROM f GROUP BY lang),
pp AS MATERIALIZED (
  SELECT cls,
         GREATEST(s1 - m1 * m1, 1e-6) AS v1, m1,
         GREATEST(s2 - m2 * m2, 1e-6) AS v2, m2,
         GREATEST(s3 - m3 * m3, 1e-6) AS v3, m3,
         GREATEST(s4 - m4 * m4, 1e-6) AS v4, m4,
         ROUND(LN(GREATEST(s1 - m1 * m1, 1e-6)), 6) AS lv1,
         ROUND(LN(GREATEST(s2 - m2 * m2, 1e-6)), 6) AS lv2,
         ROUND(LN(GREATEST(s3 - m3 * m3, 1e-6)), 6) AS lv3,
         ROUND(LN(GREATEST(s4 - m4 * m4, 1e-6)), 6) AS lv4,
         ROUND(LN(CAST(n AS DOUBLE) / (SELECT nt FROM t)), 6) AS lnp
  FROM p),
s AS MATERIALIZED (
  SELECT f.doc_id, f.lang AS actual, p.cls,
         ROUND(p.lnp - 0.5 * (
             p.lv1 + (f.f1 - p.m1) * (f.f1 - p.m1) / p.v1
           + p.lv2 + (f.f2 - p.m2) * (f.f2 - p.m2) / p.v2
           + p.lv3 + (f.f3 - p.m3) * (f.f3 - p.m3) / p.v3
           + p.lv4 + (f.f4 - p.m4) * (f.f4 - p.m4) / p.v4), 6) AS score
  FROM f CROSS JOIN pp p),
best AS (
  SELECT doc_id, actual, cls AS pred FROM (
    SELECT doc_id, actual, cls,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cls) AS rn
    FROM s) WHERE rn = 1)
SELECT actual AS lang, pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM best GROUP BY 1, 2
"""


def _nb_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    return d.select(
        "doc_id",
        "lang",
        (nc / F.lit(100.0)).alias("f1"),
        (F.length(F.regexp_replace("text", r"[^.,;:!?']", "")) / nc).alias(
            "f2"
        ),
        (nc / (F.size(F.split("text", " ")) + F.lit(1)).cast("double")).alias(
            "f3"
        ),
        (F.length(F.regexp_replace("text", r"[^ ]", "")) / nc).alias("f4"),
    )


@declare("ml_train_naive_bayes", oracle=_NB_ORACLE)
def ml_train_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian naive-Bayes language classifier, TRAIN + EVALUATE in one
    oracle-checked pipeline: per-class means/variances/log-priors over
    four document-shape features (one grouped aggregate -- the fit IS a
    sufficient-statistics pass, no iteration), then every document
    scored against the broadcast 5-row parameter relation and argmaxed
    (score DESC, class ASC tiebreak).  Output is the 5x5 confusion
    matrix (actual lang, predicted lang, count) -- the trained model's
    quality is itself the hash-checked result.  At 100 TB: one shuffle
    on the class key, then a map-side broadcast score pass."""
    f = _nb_feature_frame(spark, sf_dir).cache()
    total = f.count()  # bounded: one scalar

    def moments(i: int):
        c = F.col(f"f{i}")
        return [
            F.round(F.avg(c), 6).alias(f"m{i}"),
            F.round(F.avg(c * c), 6).alias(f"s{i}"),
        ]

    p = f.groupBy(F.col("lang").alias("cls")).agg(
        F.count("*").alias("n"),
        *[m for i in range(1, 5) for m in moments(i)],
    )
    v = [
        F.greatest(
            F.col(f"s{i}") - F.col(f"m{i}") * F.col(f"m{i}"), F.lit(1e-6)
        ).alias(f"v{i}")
        for i in range(1, 5)
    ]
    pp = p.select(
        "cls",
        *[F.col(f"m{i}") for i in range(1, 5)],
        *v,
        F.round(
            F.log(F.col("n").cast("double") / F.lit(float(total))), 6
        ).alias("lnp"),
    ).select(
        "*",
        *[F.round(F.log(F.col(f"v{i}")), 6).alias(f"lv{i}") for i in range(1, 5)],
    )
    quad = sum(
        (
            F.col(f"lv{i}")
            + (F.col(f"f{i}") - F.col(f"m{i}"))
            * (F.col(f"f{i}") - F.col(f"m{i}"))
            / F.col(f"v{i}")
            for i in range(1, 5)
        ),
        F.lit(0.0),
    )
    scored = f.crossJoin(F.broadcast(pp)).select(
        "doc_id",
        F.col("lang").alias("actual"),
        "cls",
        F.round(F.col("lnp") - 0.5 * quad, 6).alias("score"),
    )
    best = (
        scored.groupBy("doc_id", "actual")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), F.col("cls"))).alias("b"))
        .select("actual", F.col("b.cls").alias("pred"))
    )
    out = best.groupBy(F.col("actual").alias("lang"), "pred").agg(
        F.count("*").alias("n_docs")
    )
    f.unpersist()
    return out
