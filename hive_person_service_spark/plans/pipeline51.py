"""Round-7 ML TRAINING surface (operators/ml_train.py).

The ml family previously held only fixed-weight inference
(ml_score_logistic); these two queries add distributed model FITTING:

* ``ml_train_ols`` -- multi-feature closed-form least squares.  The
  whole fit is two aggregate passes (means, then centered second
  moments -- 6 accumulators) + a driver-side 2x2 Cramer solve, which
  the DuckDB oracle replays verbatim in SQL, so the trained
  coefficients themselves are hash-checked cross-engine.  This is the
  sufficient-statistics decomposition: at 100 TB the executors stream
  the data once and ship back O(k^2) doubles.

* ``ml_train_quality_classifier`` -- binary logistic regression by
  deterministic full-batch gradient descent over document-quality
  features (predicting lang='en' from length/punctuation/word-shape
  statistics -- the fasttext-style quality-classifier shape every
  LLM data pipeline trains).  Each GD step is ONE aggregate (k+1
  gradient components); 25 steps, zero init, fixed lr.  Non-SQL
  (iterative), so rows-only; tests/test_ml_train.py pins the whole
  trajectory against an independent numpy replay to 1e-6 and the
  fit against sklearn-free closed checks (separable-toy exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_OLS_ORACLE = """
WITH m AS (
  SELECT AVG(l_extendedprice) AS my, AVG(l_quantity) AS m1,
         AVG(l_discount) AS m2, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
),
s AS (
  SELECT SUM((l_quantity - m.m1) * (l_quantity - m.m1)) AS s11,
         SUM((l_quantity - m.m1) * (l_discount - m.m2)) AS s12,
         SUM((l_discount - m.m2) * (l_discount - m.m2)) AS s22,
         SUM((l_quantity - m.m1) * (l_extendedprice - m.my)) AS s1y,
         SUM((l_discount - m.m2) * (l_extendedprice - m.my)) AS s2y,
         SUM((l_extendedprice - m.my) * (l_extendedprice - m.my)) AS syy
  FROM lineitem CROSS JOIN m
),
c AS (
  SELECT (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
         (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2,
         s1y, s2y, syy
  FROM s
)
SELECT ROUND(m.my - c.b1 * m.m1 - c.b2 * m.m2, 4) AS b0,
       ROUND(c.b1, 6) AS b1,
       ROUND(c.b2, 6) AS b2,
       ROUND((c.b1 * c.s1y + c.b2 * c.s2y) / c.syy, 6) AS r2,
       m.n AS n
FROM c CROSS JOIN m
"""


@declare("ml_train_ols", oracle=_OLS_ORACLE)
def ml_train_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train y = b0 + b1*quantity + b2*discount on lineitem by centered
    normal equations (operators/ml_train.py): one means pass, one
    second-moment pass (6 accumulators), Cramer's rule on the driver.
    The oracle solves the IDENTICAL algebra in DuckDB SQL, so the
    hash-match certifies the distributed sufficient statistics AND the
    solve -- trained coefficients as checkable query output."""
    from ..operators.ml_train import ols_normal_equations

    li = load_table(spark, sf_dir, "lineitem")
    fit = ols_normal_equations(
        li, y="l_extendedprice", x1="l_quantity", x2="l_discount"
    )
    row = spark.createDataFrame(
        [(fit["b0"], fit["b1"], fit["b2"], fit["r2"], fit["n"])],
        "b0 double, b1 double, b2 double, r2 double, n bigint",
    )
    return row.select(
        F.round("b0", 4).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        F.round("r2", 6).alias("r2"),
        "n",
    )


FEATURE_NAMES = ["f_len", "f_punct", "f_wordlen", "f_space"]


def _quality_features():
    """name -> Spark expression over `documents` (text, n_chars); built
    lazily because Column construction needs an active session."""
    return {
        "f_len": F.col("n_chars").cast("double") / F.lit(100.0),
        "f_punct": F.length(F.regexp_replace("text", r"[^.,;:!?']", ""))
        / F.col("n_chars").cast("double"),
        "f_wordlen": F.col("n_chars").cast("double")
        / (F.size(F.split("text", " ")) + F.lit(1)).cast("double"),
        "f_space": F.length(F.regexp_replace("text", r"[^ ]", ""))
        / F.col("n_chars").cast("double"),
    }


def quality_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        (F.col("lang") == "en").cast("double").alias("label"),
        *[expr.alias(name) for name, expr in _quality_features().items()],
    )


@declare("ml_train_quality_classifier", oracle=None)
def ml_train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING end to end: logistic regression on
    four document-shape features (z-scored), fit by 25 deterministic
    full-batch GD steps -- each step one distributed aggregate, only
    k+1 doubles to the driver -- predicting lang='en'.  Output is the
    trained model card (standardized weights, bias, final log-loss,
    train accuracy, n) in long form.  Rows-only (iterative, not
    SQL-expressible); the numpy trajectory replay in
    tests/test_ml_train.py is the correctness pin."""
    from ..operators.ml_train import logreg_train

    feats = quality_feature_frame(spark, sf_dir)
    fit = logreg_train(feats, FEATURE_NAMES, "label", iters=25, lr=1.0)
    rows = [
        (f"w_{name}", float(fit["weights"][j]))
        for j, name in enumerate(FEATURE_NAMES)
    ]
    rows += [
        ("bias", float(fit["bias"])),
        ("log_loss", float(fit["loss"])),
        ("accuracy", float(fit["accuracy"])),
        ("n", float(fit["n"])),
    ]
    out = spark.createDataFrame(rows, "term string, value double")
    return out.select("term", F.round("value", 5).alias("value"))
