"""Pins for operators/ml_train.py -- the correctness evidence behind
the rows-only ml_train_quality_classifier entry and an independent
closed-form check for ml_train_ols."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hive_person_service_spark.operators.ml_train import (
    logreg_train,
    ols_normal_equations,
)

SF = "/root/testdata/sf0.001"


def test_ols_matches_numpy_lstsq(spark):
    from hive_person_service_spark.sources import load_table

    li = load_table(spark, SF, "lineitem")
    fit = ols_normal_equations(li, y="l_extendedprice", x1="l_quantity", x2="l_discount")
    pdf = li.select("l_extendedprice", "l_quantity", "l_discount").toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"].to_numpy(), pdf["l_discount"].to_numpy()]
    )
    y = pdf["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert fit["b0"] == pytest.approx(beta[0], rel=1e-9)
    assert fit["b1"] == pytest.approx(beta[1], rel=1e-9)
    assert fit["b2"] == pytest.approx(beta[2], rel=1e-9)
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert fit["r2"] == pytest.approx(r2, abs=1e-9)
    assert fit["n"] == len(pdf)


def _numpy_logreg(X, y, iters, lr):
    """Independent replay of the exact GD recurrence (z-score, zero
    init, full-batch mean gradient)."""
    mu, sd = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-12)
    Z = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        err = p - y
        w -= lr * (Z * err[:, None]).mean(axis=0)
        b -= lr * err.mean()
    p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
    loss = float(np.mean(-y * np.log(p) - (1 - y) * np.log(1 - p)))
    acc = float(np.mean(((Z @ w + b) > 0).astype(float) == y))
    return w, b, loss, acc


def test_logreg_trajectory_matches_numpy_replay(spark):
    from hive_person_service_spark.plans.pipeline51 import (
        FEATURE_NAMES,
        quality_feature_frame,
    )

    feats = quality_feature_frame(spark, SF)
    fit = logreg_train(feats, FEATURE_NAMES, "label", iters=25, lr=1.0)
    pdf = feats.toPandas()
    X = pdf[FEATURE_NAMES].to_numpy(dtype=float)
    y = pdf["label"].to_numpy(dtype=float)
    w, b, loss, acc = _numpy_logreg(X, y, iters=25, lr=1.0)
    np.testing.assert_allclose(fit["weights"], w, rtol=0, atol=1e-6)
    assert fit["bias"] == pytest.approx(b, abs=1e-6)
    assert fit["loss"] == pytest.approx(loss, abs=1e-6)
    assert fit["accuracy"] == pytest.approx(acc, abs=1e-12)
    assert fit["n"] == len(pdf)
    # the fit must beat the base rate (it learned SOMETHING about
    # lang='en'), and the loss must beat the zero-model's log(2)
    assert fit["loss"] < np.log(2.0)
    assert fit["accuracy"] >= max(y.mean(), 1 - y.mean())


def test_logreg_deterministic_across_runs(spark):
    from hive_person_service_spark.plans.pipeline51 import (
        FEATURE_NAMES,
        quality_feature_frame,
    )

    feats = quality_feature_frame(spark, SF)
    a = logreg_train(feats, FEATURE_NAMES, "label", iters=5, lr=1.0)
    b = logreg_train(feats, FEATURE_NAMES, "label", iters=5, lr=1.0)
    assert a["weights"] == b["weights"] and a["bias"] == b["bias"]


def test_logreg_separable_toy_drives_margin(spark):
    """On a linearly separable toy set GD must reach 100% accuracy and
    keep pushing the margin (weights finite, loss small)."""
    rows = [(float(i > 0), float(i)) for i in range(-20, 21) if i != 0]
    df = spark.createDataFrame(rows, "label double, x double")
    fit = logreg_train(df, ["x"], "label", iters=60, lr=1.0)
    assert fit["accuracy"] == 1.0
    assert fit["weights"][0] > 0
    assert fit["loss"] < 0.12


def test_logreg_saturated_sigmoid_loss_is_finite(spark):
    """Perfectly separable data with a hot learning rate drives the
    sigmoid to exact 0.0/1.0 in float64; the loss clamp must keep every
    row in the average instead of NULLing the saturated ones (round-8
    fix: unclamped ln(0) rows were silently dropped)."""
    from hive_person_service_spark.operators.ml_train import logreg_train

    rows = [(float(x), 0.0) for x in range(-50, 0)] + [
        (float(x), 1.0) for x in range(1, 51)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    m = logreg_train(df, ["x"], "y", iters=200, lr=5.0)
    assert math.isfinite(m["loss"]) and m["loss"] >= 0.0
    assert m["accuracy"] == 1.0
