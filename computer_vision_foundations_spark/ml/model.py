"""Trainable model head (reference M3, `03a_Model Training.py:218-233`).

The reference freezes a MobileNetV2 backbone and trains a fresh 2-class
classifier head. The engine's always-available equivalent is a
:class:`LogisticHead` over the feature vectors produced by the
batch-transform operator (``operators/transform.to_training_batches``)
— the same "frozen featurizer + trainable linear head" shape, with the
featurizer being the (stubbed) image decode instead of a convnet.

A torch backend implementing the reference's exact architecture is
import-guarded: construction raises a clear ImportError when torch is
absent (this container), and everything else in the ML layer — train
loop, tuning, distributed averaging, registry, serving — works
identically against the numpy head because both expose
``predict_proba(np.ndarray) -> np.ndarray``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

try:  # pragma: no cover - torch is absent in the test container
    import torch  # noqa: F401

    HAVE_TORCH = True
except Exception:  # pragma: no cover
    HAVE_TORCH = False


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # Clip to keep exp() finite; gradient outside this range is ~0 anyway.
    return 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))


@dataclass
class LogisticHead:
    """Binary classifier head: sigmoid(X @ w + b) → P(label=1).

    Mirrors the reference head's role (2-class output read as the
    positive-class probability, `04a_Model Deployment.py:103-105`
    softmax[:, 1]).
    """

    weights: np.ndarray
    bias: float = 0.0
    meta: dict = field(default_factory=dict)

    @classmethod
    def zeros(cls, n_features: int) -> "LogisticHead":
        return cls(weights=np.zeros(n_features, dtype=np.float64), bias=0.0)

    @property
    def n_features(self) -> int:
        return int(self.weights.shape[0])

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return _sigmoid(X @ self.weights + self.bias)

    # -- serialization (registry / executor shipping) -----------------
    def to_dict(self) -> dict:
        return {
            "type": "logistic_head",
            "weights": self.weights.tolist(),
            "bias": float(self.bias),
            "meta": dict(self.meta),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LogisticHead":
        if d.get("type") != "logistic_head":
            raise ValueError(f"not a logistic_head payload: {d.get('type')!r}")
        return cls(
            weights=np.asarray(d["weights"], dtype=np.float64),
            bias=float(d["bias"]),
            meta=dict(d.get("meta", {})),
        )


def features_matrix(
    pdf: pd.DataFrame, features_col: str = "features", n_features: int | None = None
) -> np.ndarray:
    """Stack a pandas column of float lists into a dense (n, d) matrix,
    right-padding/truncating to ``n_features`` when given (decoded
    feature strips may be shorter than the cap for short payloads)."""
    rows = []
    for f in pdf[features_col]:
        a = np.asarray(f, dtype=np.float64)
        if n_features is not None:
            if len(a) < n_features:
                a = np.pad(a, (0, n_features - len(a)))
            else:
                a = a[:n_features]
        rows.append(a)
    if not rows:
        return np.zeros((0, n_features or 0))
    if n_features is None:
        width = max(len(a) for a in rows)
        rows = [np.pad(a, (0, width - len(a))) for a in rows]
    return np.stack(rows)


def content_predict_fn(model: LogisticHead, n_features: int = 256):
    """Build a ``predict_fn`` for ``operators/score.score_with`` that
    goes content-bytes → features → P(label=1), i.e. the engine twin of
    the reference's pyfunc wrapper (`04a_Model Deployment.py:65-105`:
    decode → transform → forward → softmax[:, 1]).

    The returned callable closes over plain numpy state (picklable) and
    is Arrow-batch vectorized end to end.
    """
    from computer_vision_foundations_spark.functions.image import _fake_pixels

    weights = model.weights.copy()
    bias = float(model.bias)

    def predict(batch: pd.DataFrame) -> pd.Series:
        feats = np.zeros((len(batch), n_features), dtype=np.float64)
        for i, content in enumerate(batch["content"]):
            px = np.asarray(
                _fake_pixels(bytes(content), n_features), dtype=np.float64
            )
            feats[i, : len(px)] = px / 255.0
        return pd.Series(_sigmoid(feats @ weights + bias))

    return predict


class TorchTransferModel:  # pragma: no cover - requires torch
    """Reference M3 architecture (MobileNetV2 backbone frozen, 2-class
    head, `03a_Model Training.py:218-233`) for environments with torch.
    Kept import-guarded; the test container intentionally has no torch.
    """

    def __init__(self, n_classes: int = 2):
        if not HAVE_TORCH:
            raise ImportError(
                "torch is not installed; use LogisticHead (numpy) or install "
                "the optional ML extra"
            )
        import torch.nn as nn
        from torchvision import models

        self.net = models.mobilenet_v2(weights="DEFAULT")
        for p in self.net.parameters():
            p.requires_grad = False
        self.net.classifier[1] = nn.Linear(self.net.last_channel, n_classes)

    def predict_proba(self, X):
        import torch

        with torch.no_grad():
            logits = self.net(torch.as_tensor(X, dtype=torch.float32))
            return torch.softmax(logits, dim=1)[:, 1].numpy()
