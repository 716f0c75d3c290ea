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


class ModelServer:
    """Live REST endpoint for a registered model — the in-engine
    equivalent of the reference's serving cluster
    (`04a_Model Deployment.py:289-367`): a threaded stdlib HTTP server
    exposing ``POST /model/<name>/<stage>/invocations`` with optional
    bearer-token auth, records-oriented JSON in,
    ``{"predictions": [...]}`` out — the exact wire contract the
    reference's client cell speaks, so that client code ports by
    swapping the URL.

    Context-manager lifecycle (``with ModelServer(model) as url:``)
    binds an ephemeral port, serves on a daemon thread, and shuts down
    on exit. Single-model, single-stage by design — model serving is a
    stateless sidecar, not an engine concern; anything heavier
    (autoscaling, batching) belongs to the deployment platform, which
    is why SURVEY M8 scopes the ENGINE's obligation to the payload
    codec this server wraps."""

    def __init__(
        self,
        model: LogisticHead,
        model_name: str = "model",
        stage: str = "Production",
        n_features: int = 256,
        token: str | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._model = model
        self._path = f"/model/{model_name}/{stage}/invocations"
        self._n_features = n_features
        self._token = token
        self._host = host
        self._port = port
        self._server = None
        self._thread = None

    def __enter__(self) -> str:
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, body: dict) -> None:
                data = json.dumps(body).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self) -> None:
                if self.path != outer._path:
                    self._reply(404, {"error": "unknown model path"})
                    return
                if outer._token is not None:
                    auth = self.headers.get("Authorization", "")
                    if auth != f"Bearer {outer._token}":
                        self._reply(401, {"error": "unauthorized"})
                        return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = self.rfile.read(n).decode("utf-8")
                    body = score_rest_payload(
                        outer._model, payload, outer._n_features
                    )
                    self._reply(200, json.loads(body))
                except Exception as e:  # malformed payload -> 400, not a crash
                    self._reply(400, {"error": str(e)})

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}{self._path}"

    def __exit__(self, *exc) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
