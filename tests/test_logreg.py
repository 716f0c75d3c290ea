"""Logistic GD: exact agreement with a numpy reference implementation
of the same recurrence, and loss decreases on separable data."""

import numpy as np
from pyspark.sql import Row

from computer_vision_foundations_spark.operators.logreg import logistic_gd


def _np_gd(X, y, lr=0.5, n_iter=5):
    Xb = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(Xb.shape[1])
    for _ in range(n_iter):
        sig = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w - lr * ((sig - y)[:, None] * Xb).mean(axis=0)
    sig = 1.0 / (1.0 + np.exp(-(Xb @ w)))
    loss = float(-(y * np.log(sig) + (1 - y) * np.log(1 - sig)).mean())
    return w, loss


def _data(seed=5, n=400):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] + rng.normal(scale=0.3, size=n) > 0).astype(
        float
    )
    return X, y


def test_logistic_gd_matches_numpy(spark):
    X, y = _data()
    df = spark.createDataFrame(
        [Row(a=float(a), b=float(b), y=int(t)) for (a, b), t in zip(X, y)]
    )
    row = logistic_gd(df, ["a", "b"], "y", lr=0.5, n_iter=5).collect()[0]
    w, loss = _np_gd(X, y)
    assert abs(row["w_bias"] - round(w[0], 6)) < 2e-6
    assert abs(row["w_a"] - round(w[1], 6)) < 2e-6
    assert abs(row["w_b"] - round(w[2], 6)) < 2e-6
    assert abs(row["logloss"] - round(loss, 6)) < 2e-6


def test_logistic_gd_learns_signal(spark):
    X, y = _data(seed=11)
    df = spark.createDataFrame(
        [Row(a=float(a), b=float(b), y=int(t)) for (a, b), t in zip(X, y)]
    )
    row = logistic_gd(df, ["a", "b"], "y", lr=0.5, n_iter=5).collect()[0]
    # y is driven positively by both features
    assert row["w_a"] > 0 and row["w_b"] > 0
    assert row["logloss"] < np.log(2)  # better than the w=0 start
