"""Training loop (reference M4, `03a_Model Training.py:210-401`).

The reference trains with BCE loss, SGD(momentum), StepLR(step, gamma),
5 epochs, batch 32, tracking per-epoch loss/accuracy for train and
eval phases. :func:`fit_numpy` is that loop verbatim in numpy over a
:class:`~computer_vision_foundations_spark.ml.model.LogisticHead`;
:func:`fit_dataframe` feeds it from a Spark DataFrame.

Scale note: head-only training state is O(n_features) and minibatches
stream through the driver, so ``fit_dataframe`` collects features once
(documented ceiling: driver memory). For data that doesn't fit one
node, use :func:`ml.distributed.fit_sharded` — per-shard local SGD +
parameter averaging inside the Spark plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from computer_vision_foundations_spark.ml.model import (
    LogisticHead,
    _sigmoid,
    features_matrix,
)


@dataclass(frozen=True)
class TrainConfig:
    """Reference hyperparameters (`03a_Model Training.py:210-213`):
    batch 32, 5 epochs, SGD momentum, StepLR(step_size, gamma)."""

    lr: float = 0.01
    momentum: float = 0.9
    batch_size: int = 32
    epochs: int = 5
    lr_step_size: int = 2
    lr_gamma: float = 0.1
    l2: float = 0.0
    seed: int = 42


def bce_loss(p: np.ndarray, y: np.ndarray) -> float:
    eps = 1e-12
    return float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))


def fit_numpy(
    X: np.ndarray,
    y: np.ndarray,
    cfg: TrainConfig = TrainConfig(),
    init: LogisticHead | None = None,
) -> tuple[LogisticHead, list[dict]]:
    """Minibatch SGD with momentum + StepLR on BCE loss.

    Returns the trained head and a per-epoch history
    ``[{epoch, lr, loss, accuracy}, ...]`` (the reference's per-epoch
    metric logging, `03a_Model Training.py:256-291`).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    model = init or LogisticHead.zeros(d)
    w = model.weights.copy()
    b = float(model.bias)
    vw = np.zeros_like(w)
    vb = 0.0
    rng = np.random.default_rng(cfg.seed)
    history: list[dict] = []
    for epoch in range(cfg.epochs):
        lr = cfg.lr * (cfg.lr_gamma ** (epoch // cfg.lr_step_size))
        order = rng.permutation(n)
        for start in range(0, n, cfg.batch_size):
            idx = order[start : start + cfg.batch_size]
            Xb, yb = X[idx], y[idx]
            p = _sigmoid(Xb @ w + b)
            # dBCE/dz = (p - y); average over the batch
            gz = (p - yb) / max(len(idx), 1)
            gw = Xb.T @ gz + cfg.l2 * w
            gb = float(np.sum(gz))
            vw = cfg.momentum * vw - lr * gw
            vb = cfg.momentum * vb - lr * gb
            w = w + vw
            b = b + vb
        p_all = _sigmoid(X @ w + b)
        history.append(
            {
                "epoch": epoch,
                "lr": lr,
                "loss": bce_loss(p_all, y),
                "accuracy": float(np.mean((p_all >= 0.5) == (y >= 0.5))),
            }
        )
    out = LogisticHead(weights=w, bias=b, meta={"trained_on": n, "cfg": vars(cfg)})
    return out, history


def evaluate(model: LogisticHead, X: np.ndarray, y: np.ndarray) -> dict:
    p = model.predict_proba(X)
    y = np.asarray(y, dtype=np.float64)
    return {
        "loss": bce_loss(p, y),
        "accuracy": float(np.mean((p >= 0.5) == (y >= 0.5))),
    }


def dataframe_to_xy(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    n_features: int | None = None,
    max_driver_rows: int | None = 500_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-collect (features, label) into dense numpy arrays.

    DRIVER-SIZED input contract: this materializes the whole frame
    on the driver (it mirrors the reference's single-node training
    loop). ``max_driver_rows`` enforces it — a frame above the cap
    raises with a pointer to ``ml.distributed.fit_sharded``, the
    scale path, instead of silently OOMing the driver on a
    corpus-sized input. Pass ``None`` to opt out explicitly.
    """
    if max_driver_rows is not None:
        n = df.limit(max_driver_rows + 1).count()
        if n > max_driver_rows:
            raise ValueError(
                f"dataframe_to_xy: input exceeds max_driver_rows="
                f"{max_driver_rows} (driver-sized contract). Use "
                "ml.distributed.fit_sharded for corpus-sized training, "
                "or pass max_driver_rows=None to opt out."
            )
    pdf: pd.DataFrame = df.select(features_col, label_col).toPandas()
    X = features_matrix(pdf, features_col, n_features)
    y = pdf[label_col].to_numpy(dtype=np.float64)
    return X, y


def fit_dataframe(
    df: DataFrame,
    cfg: TrainConfig = TrainConfig(),
    features_col: str = "features",
    label_col: str = "label",
    n_features: int | None = None,
    max_driver_rows: int | None = 500_000,
) -> tuple[LogisticHead, list[dict]]:
    """Train the head on a (features, label) DataFrame — the engine's
    M4 entry point, fed by ``to_training_batches`` (U4).

    Driver-sized input contract — see :func:`dataframe_to_xy`;
    corpus-sized training belongs to ``ml.distributed.fit_sharded``."""
    X, y = dataframe_to_xy(
        df, features_col, label_col, n_features, max_driver_rows
    )
    return fit_numpy(X, y, cfg)
