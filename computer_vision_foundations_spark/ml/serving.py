"""REST serving payload codec + local endpoint stand-in (reference M8,
`04a_Model Deployment.py:289-367`).

The reference serializes sample rows as records-oriented JSON with the
binary ``content`` base64-encoded, POSTs them to a Databricks serving
endpoint, and reads back ``{"predictions": [...]}``. The engine keeps
the payload contract (so any HTTP layer can ship it) and provides
:func:`score_rest_payload` as the server-side half — decode, score with
the same predict path used in-stream, respond — making the round trip
testable without a network.
"""

from __future__ import annotations

import base64
import json

import pandas as pd

from computer_vision_foundations_spark.ml.model import (
    LogisticHead,
    content_predict_fn,
)


def to_rest_payload(pdf: pd.DataFrame, content_col: str = "content") -> str:
    """pandas → records-oriented JSON with base64 content
    (`04a_Model Deployment.py:318-327`)."""
    out = pdf.copy()
    out[content_col] = out[content_col].map(
        lambda b: base64.b64encode(bytes(b)).decode("utf-8")
    )
    return json.dumps(
        {"dataframe_records": out.to_dict(orient="records")}
    )


def parse_rest_payload(payload: str, content_col: str = "content") -> pd.DataFrame:
    """JSON → pandas; base64 sniffing matches the reference wrapper
    (`04a_Model Deployment.py:92-93`): str content is decoded, bytes
    pass through."""
    records = json.loads(payload)["dataframe_records"]
    pdf = pd.DataFrame.from_records(records)
    if content_col in pdf.columns and len(pdf):
        first = pdf[content_col].iloc[0]
        if isinstance(first, str):
            pdf[content_col] = pdf[content_col].map(base64.b64decode)
    return pdf


def score_rest_payload(
    model: LogisticHead, payload: str, n_features: int = 256
) -> str:
    """Server half: parse → predict → ``{"predictions": [...]}``."""
    pdf = parse_rest_payload(payload)
    predict = content_predict_fn(model, n_features)
    scores = predict(pdf)
    return json.dumps({"predictions": [float(s) for s in scores]})
