"""Distributed model TRAINING operators (the registry's ml family had
only fixed-weight inference until round 7).

Both trainers here follow the one shape that survives 100 TB: the data
never leaves the executors -- each optimization step is a single
partial+final AGGREGATE producing O(k) or O(k^2) numbers (k = feature
count), and only those accumulators reach the driver.  That is exactly
the classic data-parallel ML decomposition (sufficient statistics for
closed-form models, full-batch gradients for iterative ones) and the
same shape Spark MLlib's own optimizers use.

* ``ols_normal_equations`` -- closed-form least squares from one pass of
  centered second moments; the 2-feature solve is Cramer's rule, which
  a SQL oracle can replay verbatim (plans/pipeline51.py does).
* ``logreg_train`` -- binary logistic regression by deterministic
  full-batch gradient descent: zero init, fixed iteration count, fixed
  learning rate, z-scored features.  One Spark aggregate per iteration
  (k+1 gradient accumulators + the loss), weights updated driver-side.
  Iteration count bounds the job count the way the BPE merge loop and
  PageRank rounds are bounded -- standard for distributed batch GD.
  Everything is float64 and order-insensitive up to summation
  reordering, so an independent numpy replay matches to ~1e-9
  (pinned in tests/test_ml_train.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_normal_equations(df: DataFrame, y: str, x1: str, x2: str) -> dict:
    """Two-feature OLS via centered normal equations.

    Pass 1: means; pass 2: centered sums of squares/products (5 numbers);
    Cramer's rule driver-side.  Returns b0/b1/b2/r2/n."""
    m = df.agg(
        F.avg(y).alias("my"), F.avg(x1).alias("m1"), F.avg(x2).alias("m2"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    d1 = F.col(x1) - F.lit(m["m1"])
    d2 = F.col(x2) - F.lit(m["m2"])
    dy = F.col(y) - F.lit(m["my"])
    s = df.agg(
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
        F.sum(dy * dy).alias("syy"),
    ).collect()[0]
    det = s["s11"] * s["s22"] - s["s12"] * s["s12"]
    b1 = (s["s1y"] * s["s22"] - s["s2y"] * s["s12"]) / det
    b2 = (s["s2y"] * s["s11"] - s["s1y"] * s["s12"]) / det
    b0 = m["my"] - b1 * m["m1"] - b2 * m["m2"]
    r2 = (b1 * s["s1y"] + b2 * s["s2y"]) / s["syy"]
    return {"b0": b0, "b1": b1, "b2": b2, "r2": r2, "n": int(m["n"])}


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 1.0,
) -> dict:
    """Deterministic full-batch GD for binary logistic regression.

    ``df`` is standardized (z-score per feature, population std) and
    CACHED once; every iteration is then a single aggregate yielding
    the k+1 gradient components and the mean log-loss.  Returns the
    weights in STANDARDIZED space plus the scaler (means/stds), the
    final loss, and training accuracy -- all float64, reproducible
    bit-for-bit given a fixed partitioning up to summation order."""
    k = len(feature_cols)
    stats = df.agg(
        *[F.avg(c).alias(f"m{j}") for j, c in enumerate(feature_cols)],
        *[F.stddev_pop(c).alias(f"s{j}") for j, c in enumerate(feature_cols)],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = int(stats["n"])
    means = [float(stats[f"m{j}"]) for j in range(k)]
    stds = [max(float(stats[f"s{j}"]), 1e-12) for j in range(k)]

    z = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[
            ((F.col(c) - F.lit(means[j])) / F.lit(stds[j])).alias(f"_z{j}")
            for j, c in enumerate(feature_cols)
        ],
    ).cache()
    z.count()  # materialize once; every GD step reuses the cached batch

    w = [0.0] * k
    b = 0.0
    for _ in range(iters):
        margin = F.lit(b)
        for j in range(k):
            margin = margin + F.lit(w[j]) * F.col(f"_z{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        err = p - F.col("_y")
        row = z.agg(
            *[F.avg(err * F.col(f"_z{j}")).alias(f"g{j}") for j in range(k)],
            F.avg(err).alias("gb"),
        ).collect()[0]
        for j in range(k):
            w[j] -= lr * float(row[f"g{j}"])
        b -= lr * float(row["gb"])

    # final loss/accuracy evaluated AT the trained weights (one extra
    # pass), so the reported loss is the model's, not the second-to-
    # last iterate's
    margin = F.lit(b)
    for j in range(k):
        margin = margin + F.lit(w[j]) * F.col(f"_z{j}")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    # clamp before the logs: a saturated sigmoid (|margin| beyond ~37
    # in float64) yields p of exactly 0.0/1.0, and Spark's ln of a
    # non-positive value is NULL -- which would silently DROP the
    # worst-classified rows from the average loss
    eps = 1e-15
    p_safe = F.greatest(F.least(p, F.lit(1.0 - eps)), F.lit(eps))
    row = z.agg(
        F.avg(
            -F.col("_y") * F.log(p_safe)
            - (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - p_safe)
        ).alias("loss"),
        F.avg(((margin > 0).cast("double") == F.col("_y")).cast("double")).alias("a"),
    ).collect()[0]
    loss = float(row["loss"])
    acc = float(row["a"])
    z.unpersist()
    if not all(math.isfinite(v) for v in [*w, b, loss, acc]):
        raise ArithmeticError("logreg_train diverged (non-finite parameters)")
    return {
        "weights": w,
        "bias": b,
        "means": means,
        "stds": stds,
        "loss": loss,
        "accuracy": acc,
        "n": n,
        "iters": iters,
        "lr": lr,
    }
