"""Edge deployment bundle (reference M9, `04b_Model Deployment.py:246-477`).

The reference's edge path is a markdown shell recipe: download the
registered model artifact to a Raspberry Pi, install a matching
runtime, and score locally with a pyfunc ``predict``. The engine
equivalent is a self-contained directory bundle:

    bundle/
      model.json        # LogisticHead params + metadata (stdlib JSON)
      MANIFEST.json     # bundle format version, feature config
      predict.py        # standalone scorer: stdin records-JSON ->
                        # stdout scores; needs only python3 + numpy

``export_edge_bundle`` writes it from a model (or a registry stage,
mirroring `04b_Model Deployment.py:181-189`'s models:/<name>/<stage>
URI); ``edge_predict`` is the in-process equivalent of running the
script. The payload codec is the REST one (`ml/serving.py`): records
JSON with base64-or-bytes ``content``, exactly the wrapper-sniffing
contract of `04a_Model Deployment.py:92-93` — so a payload built for
the serving endpoint scores identically at the edge.

No Spark, no torch, no mlflow on the edge device — by construction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd

from computer_vision_foundations_spark.ml.model import (
    LogisticHead,
    content_predict_fn,
)
from computer_vision_foundations_spark.ml.serving import parse_rest_payload

__all__ = ["export_edge_bundle", "edge_predict", "edge_predict_subprocess"]

_BUNDLE_VERSION = 1

# The standalone scorer: duplicated-by-design minimal logic (the edge
# device does not install this package). Kept tiny enough to audit,
# and BIT-IDENTICAL to ml/model.content_predict_fn: base64 sniff +
# first-n-bytes/255 feature strip + clipped sigmoid(X @ w + b).
_PREDICT_PY = '''\
#!/usr/bin/env python3
"""Standalone edge scorer: records-JSON on stdin -> scores on stdout.

Usage: python3 predict.py < payload.json
Payload: {"dataframe_records": [{"content": "<base64 or text>"}, ...]}
Only python3 + numpy required.
"""
import base64
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    with open(os.path.join(HERE, "model.json")) as f:
        m = json.load(f)
    with open(os.path.join(HERE, "MANIFEST.json")) as f:
        manifest = json.load(f)
    n_features = manifest["n_features"]
    w = np.asarray(m["weights"], dtype=np.float64)
    b = float(m["bias"])

    payload = json.load(sys.stdin)
    records = payload["dataframe_records"]
    feats = np.zeros((len(records), n_features), dtype=np.float64)
    for i, rec in enumerate(records):
        content = rec["content"]
        if isinstance(content, str):  # base64 sniff, like the wrapper
            content = base64.b64decode(content)
        content = bytes(content)
        # first-n-bytes strip / 255, zero-padded — the
        # content_predict_fn featurization, verbatim
        px = np.frombuffer(content[:n_features], dtype=np.uint8)
        if px.size == 0:
            px = np.zeros(1, dtype=np.uint8)
        feats[i, : len(px)] = px.astype(np.float64) / 255.0
    z = np.clip(feats @ w + b, -35.0, 35.0)
    scores = 1.0 / (1.0 + np.exp(-z))
    json.dump({"predictions": [float(s) for s in scores]}, sys.stdout)


if __name__ == "__main__":
    main()
'''


def export_edge_bundle(
    model: LogisticHead, path: str, n_features: int | None = None
) -> str:
    """Write a self-contained scoring bundle; returns the path."""
    os.makedirs(path, exist_ok=True)
    nf = n_features if n_features is not None else model.n_features
    if nf != model.n_features:
        raise ValueError(
            f"model has {model.n_features} features, bundle declares {nf}"
        )
    with open(os.path.join(path, "model.json"), "w") as f:
        json.dump(model.to_dict(), f)
    with open(os.path.join(path, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "bundle_version": _BUNDLE_VERSION,
                "n_features": nf,
                "entrypoint": "predict.py",
            },
            f,
        )
    script = os.path.join(path, "predict.py")
    with open(script, "w") as f:
        f.write(_PREDICT_PY)
    os.chmod(script, 0o755)
    return path


def _load_bundle(path: str) -> tuple[LogisticHead, int]:
    with open(os.path.join(path, "model.json")) as f:
        model = LogisticHead.from_dict(json.load(f))
    with open(os.path.join(path, "MANIFEST.json")) as f:
        manifest = json.load(f)
    if manifest.get("bundle_version") != _BUNDLE_VERSION:
        raise ValueError(f"unsupported bundle version: {manifest}")
    return model, int(manifest["n_features"])


def edge_predict(path: str, payload: str) -> list[float]:
    """In-process reference implementation of the bundle's scorer:
    records-JSON payload (the REST codec) -> scores. Bit-identical to
    what ``predict.py`` computes on the device."""
    model, n_features = _load_bundle(path)
    pdf: pd.DataFrame = parse_rest_payload(payload)
    scores = content_predict_fn(model, n_features=n_features)(pdf)
    return [float(s) for s in scores]


def edge_predict_subprocess(path: str, payload: str) -> list[float]:
    """Actually execute the bundle's ``predict.py`` as the edge device
    would (fresh python3, stdin/stdout JSON) and return its scores."""
    proc = subprocess.run(
        [sys.executable, os.path.join(path, "predict.py")],
        input=payload.encode("utf-8"),
        capture_output=True,
        check=True,
    )
    return [float(s) for s in json.loads(proc.stdout)["predictions"]]
