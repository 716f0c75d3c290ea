"""Edge deployment bundle (ml/edge.py — reference M9,
`04b_Model Deployment.py:246-477`): export, in-process scoring, and
real subprocess execution of the standalone predict.py."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from computer_vision_foundations_spark.ml.edge import (
    edge_predict,
    edge_predict_subprocess,
    export_edge_bundle,
)
from computer_vision_foundations_spark.ml.model import (
    LogisticHead,
    content_predict_fn,
)
from computer_vision_foundations_spark.ml.serving import to_rest_payload


def _model(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return LogisticHead(weights=rng.normal(size=n), bias=0.3)


def _payload(n_rows=5, seed=1):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {"content": [bytes(rng.integers(0, 256, 64, dtype=np.uint8)) for _ in range(n_rows)]}
    )
    return pdf, to_rest_payload(pdf)


def test_bundle_layout(tmp_path):
    path = export_edge_bundle(_model(), str(tmp_path / "bundle"))
    names = sorted(os.listdir(path))
    assert names == ["MANIFEST.json", "model.json", "predict.py"]
    manifest = json.load(open(os.path.join(path, "MANIFEST.json")))
    assert manifest["n_features"] == 32
    assert os.access(os.path.join(path, "predict.py"), os.X_OK)


def test_edge_predict_matches_engine_scoring(tmp_path):
    model = _model()
    path = export_edge_bundle(model, str(tmp_path / "b"))
    pdf, payload = _payload()
    scores = edge_predict(path, payload)
    expect = content_predict_fn(model, n_features=32)(pdf)
    assert np.allclose(scores, list(expect), atol=1e-12)


def test_subprocess_scorer_bit_identical(tmp_path):
    """The device-side predict.py (fresh python3, stdin/stdout JSON)
    must produce exactly what the engine computes."""
    model = _model(seed=3)
    path = export_edge_bundle(model, str(tmp_path / "b"))
    pdf, payload = _payload(seed=4)
    sub = edge_predict_subprocess(path, payload)
    inproc = edge_predict(path, payload)
    assert sub == inproc  # both pass through float(json) — bit-equal
    assert all(0.0 <= s <= 1.0 for s in sub)


def test_empty_and_short_content(tmp_path):
    model = _model()
    path = export_edge_bundle(model, str(tmp_path / "b"))
    pdf = pd.DataFrame({"content": [b"", b"ab"]})
    payload = to_rest_payload(pdf)
    sub = edge_predict_subprocess(path, payload)
    expect = content_predict_fn(model, n_features=32)(pdf)
    assert np.allclose(sub, list(expect), atol=1e-12)


def test_feature_mismatch_raises(tmp_path):
    with pytest.raises(ValueError):
        export_edge_bundle(_model(n=16), str(tmp_path / "b"), n_features=64)
