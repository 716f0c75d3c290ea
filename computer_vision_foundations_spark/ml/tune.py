"""Hyperparameter search (reference M5, `03a_Model Training.py:415-450`).

The reference runs Hyperopt TPE over loguniform lr/momentum with
``SparkTrials(parallelism)`` — one Spark task per trial, each training
a full model. Hyperopt isn't a baked-in dependency here, so the engine
ships the same execution shape with two seeded samplers:

- ``random_search``: loguniform draws, all trials in one wave.
- ``tpe_search``: a from-scratch Tree-structured Parzen Estimator
  (Bergstra et al., NeurIPS 2011 — the algorithm behind hyperopt's
  ``tpe.suggest``): after ``n_startup`` random trials, observations
  are split at the ``gamma`` loss quantile into good/bad sets, each
  modeled per-dimension with a log-space Parzen (gaussian-mixture)
  density, and the next batch proposes the candidates maximizing the
  good/bad density ratio l(x)/g(x). Batches (not single trials) keep
  the Spark parallelism of ``SparkTrials``.

In both, trial configs come from the driver, the training set is
broadcast once, and ``sc.parallelize(trials, n).map(train)`` runs every
trial as its own Spark task.

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


def _broadcast_split(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    base_cfg: TrainConfig,
    holdout_frac: float,
    seed: int,
):
    """Seeded holdout split, broadcast once for every trial wave."""
    n = len(y)
    order = np.random.default_rng(seed).permutation(n)
    cut = max(1, int(n * holdout_frac))
    hold_idx, train_idx = order[:cut], order[cut:]
    return spark.sparkContext.broadcast(
        (X[train_idx], y[train_idx], X[hold_idx], y[hold_idx], base_cfg)
    )


def _run_trial_wave(sc, b, trial_params: list[dict], start: int) -> list[dict]:
    """One Spark task per trial (the SparkTrials execution shape)."""

    def run_trial(indexed: tuple[int, dict]) -> dict:
        i, params = indexed
        Xt, yt, Xh, yh, cfg0 = b.value
        cfg = replace(cfg0, **params)
        model, _ = fit_numpy(Xt, yt, cfg)
        metrics = evaluate(model, Xh, yh)
        return {"trial": i, **params, **metrics}

    indexed = list(enumerate(trial_params, start=start))
    out = sc.parallelize(indexed, max(len(indexed), 1)).map(run_trial).collect()
    out.sort(key=lambda t: t["trial"])
    return out


def _best_of(trials: list[dict], space: dict, base_cfg: TrainConfig):
    best = min(trials, key=lambda t: (t["loss"], t["trial"]))
    best_cfg = replace(base_cfg, **{k: best[k] for k in space})
    return best_cfg, {"loss": best["loss"], "accuracy": best["accuracy"]}


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
    b = _broadcast_split(spark, X, y, base_cfg, holdout_frac, seed)
    trials = _run_trial_wave(spark.sparkContext, b, trial_params, 0)
    b.unpersist()
    best_cfg, best_metrics = _best_of(trials, space, base_cfg)
    return best_cfg, best_metrics, trials


def _parzen_propose(
    rng: random.Random,
    observed: list[dict],
    losses: list[float],
    space: dict[str, tuple[float, float]],
    gamma: float,
    n_candidates: int,
) -> dict:
    """One TPE proposal: per dimension, model the good/bad observation
    sets as log-space gaussian mixtures and pick the candidate (sampled
    from the GOOD mixture) with the highest l(x)/g(x) density ratio.
    Univariate-independent dimensions, as in hyperopt's default TPE."""
    n = len(losses)
    n_good = max(1, math.ceil(gamma * n))
    order = np.argsort(losses, kind="stable")
    good = [observed[i] for i in order[:n_good]]
    bad = [observed[i] for i in order[n_good:]] or good

    def log_mix_pdf(x: np.ndarray, centers: np.ndarray, sigma: float) -> np.ndarray:
        # mean of N(center, sigma) densities, vectorized over candidates
        z = (x[:, None] - centers[None, :]) / sigma
        return np.exp(-0.5 * z * z).sum(axis=1) / (
            len(centers) * sigma * math.sqrt(2 * math.pi)
        )

    out = {}
    for k, (lo, hi) in space.items():
        llo, lhi = math.log(lo), math.log(hi)
        g = np.log([p[k] for p in good])
        bd = np.log([p[k] for p in bad])
        # bandwidth: range / mixture size, floored — the classic
        # Parzen heuristic; wide enough to explore early on
        sigma = max((lhi - llo) / max(len(g), 2), (lhi - llo) * 0.05)
        centers = g[np.array([rng.randrange(len(g)) for _ in range(n_candidates)])]
        cands = np.clip(
            np.array([rng.gauss(c, sigma) for c in centers]), llo, lhi
        )
        score = log_mix_pdf(cands, g, sigma) / (
            log_mix_pdf(cands, bd, sigma) + 1e-12
        )
        out[k] = math.exp(float(cands[int(np.argmax(score))]))
    return out


def tpe_search(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_trials: int = 10,
    space: dict[str, tuple[float, float]] | None = None,
    base_cfg: TrainConfig = TrainConfig(),
    holdout_frac: float = 0.25,
    seed: int = 42,
    n_startup: int = 4,
    gamma: float = 0.25,
    batch_size: int | None = None,
    n_candidates: int = 24,
) -> tuple[TrainConfig, dict, list[dict]]:
    """Tree-structured Parzen Estimator search (reference M5's actual
    algorithm, re-implemented from the published description instead of
    depending on hyperopt). Returns (best_cfg, best_metrics, trials).

    ``n_startup`` random trials seed the model; the remaining budget
    runs in batches of ``batch_size`` (default: Spark's default
    parallelism, capped by the remaining budget) so trial evaluation
    keeps SparkTrials-style cluster parallelism while the sampler
    stays sequential-adaptive between batches. Fully deterministic for
    a given seed."""
    space = space or {"lr": (1e-4, 0.5), "momentum": (0.5, 0.99)}
    rng = random.Random(seed)
    sc = spark.sparkContext
    if batch_size is None:
        batch_size = max(1, min(sc.defaultParallelism, n_trials))
    b = _broadcast_split(spark, X, y, base_cfg, holdout_frac, seed)

    trials: list[dict] = []
    startup = [_draw(rng, space) for _ in range(min(n_startup, n_trials))]
    trials += _run_trial_wave(sc, b, startup, 0)
    while len(trials) < n_trials:
        wave_n = min(batch_size, n_trials - len(trials))
        observed = [{k: t[k] for k in space} for t in trials]
        losses = [t["loss"] for t in trials]
        wave = [
            _parzen_propose(rng, observed, losses, space, gamma, n_candidates)
            for _ in range(wave_n)
        ]
        trials += _run_trial_wave(sc, b, wave, len(trials))
    b.unpersist()
    best_cfg, best_metrics = _best_of(trials, space, base_cfg)
    return best_cfg, best_metrics, trials
