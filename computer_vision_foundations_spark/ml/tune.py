"""Hyperparameter search (reference M5, `03a_Model Training.py:415-450`).

The reference runs Hyperopt TPE over loguniform lr/momentum with
``SparkTrials(parallelism)`` — one Spark task per trial, each training
a full model. Hyperopt isn't a baked-in dependency here, so the engine
ships the same execution shape with a seeded random search: trial
configs are drawn loguniformly on the driver, the training set is
broadcast once, and ``sc.parallelize(trials, n).map(train)`` runs every
trial as its own Spark task. Swapping the sampler for hyperopt's TPE
(when installed) changes only ``_draw``.

Scale note: the broadcast ships the feature matrix to each executor
once (torrent broadcast), not per trial; trials are embarrassingly
parallel and never shuffle.
"""

from __future__ import annotations

import math
import random
from dataclasses import replace

import numpy as np

from pyspark.sql import SparkSession

from computer_vision_foundations_spark.ml.train import (
    TrainConfig,
    evaluate,
    fit_numpy,
)


def loguniform(rng: random.Random, lo: float, hi: float) -> float:
    """Sample log-uniformly from [lo, hi] (hyperopt's ``loguniform``)."""
    return math.exp(rng.uniform(math.log(lo), math.log(hi)))


def _draw(rng: random.Random, space: dict[str, tuple[float, float]]) -> dict:
    return {k: loguniform(rng, lo, hi) for k, (lo, hi) in space.items()}


def random_search(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_trials: int = 10,
    space: dict[str, tuple[float, float]] | None = None,
    base_cfg: TrainConfig = TrainConfig(),
    holdout_frac: float = 0.25,
    seed: int = 42,
) -> tuple[TrainConfig, dict, list[dict]]:
    """Distributed random search; returns (best_cfg, best_metrics, trials).

    ``space`` maps TrainConfig field → (lo, hi) loguniform bounds;
    default mirrors the reference's search space
    (`03a_Model Training.py:419-423`: lr e^-9..e^-1, momentum-ish).
    Each Spark task trains on the broadcast train split and reports
    holdout loss; the driver picks the argmin (ties → first drawn, so
    results are seed-deterministic).
    """
    space = space or {"lr": (1e-4, 0.5), "momentum": (0.5, 0.99)}
    rng = random.Random(seed)
    trial_params = [_draw(rng, space) for _ in range(n_trials)]

    # Seeded holdout split, same for every trial.
    n = len(y)
    order = np.random.default_rng(seed).permutation(n)
    cut = max(1, int(n * holdout_frac))
    hold_idx, train_idx = order[:cut], order[cut:]
    sc = spark.sparkContext
    b = sc.broadcast(
        (X[train_idx], y[train_idx], X[hold_idx], y[hold_idx], base_cfg)
    )

    def run_trial(indexed: tuple[int, dict]) -> dict:
        i, params = indexed
        Xt, yt, Xh, yh, cfg0 = b.value
        cfg = replace(cfg0, **params)
        model, _ = fit_numpy(Xt, yt, cfg)
        metrics = evaluate(model, Xh, yh)
        return {"trial": i, **params, **metrics}

    trials = (
        sc.parallelize(list(enumerate(trial_params)), max(n_trials, 1))
        .map(run_trial)
        .collect()
    )
    b.unpersist()
    trials.sort(key=lambda t: t["trial"])
    best = min(trials, key=lambda t: (t["loss"], t["trial"]))
    best_cfg = replace(
        base_cfg, **{k: best[k] for k in space}
    )
    return best_cfg, {"loss": best["loss"], "accuracy": best["accuracy"]}, trials
