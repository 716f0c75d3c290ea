"""ML layer tests (M3-M8): train loop, tuning, distributed averaging,
registry stage transitions, serving payload round trip, and the
train → register → score pipeline (EP2+EP3 shape)."""

import json

import numpy as np
import pandas as pd
import pytest

from computer_vision_foundations_spark.ml import (
    LogisticHead,
    ModelRegistry,
    TrainConfig,
    content_predict_fn,
    evaluate,
    fit_dataframe,
    fit_numpy,
    fit_sharded,
    parse_rest_payload,
    random_search,
    score_rest_payload,
    to_rest_payload,
)


def _separable(n=400, d=16, seed=0):
    """Linearly separable data: label = sign of a fixed direction."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w_true = rng.normal(size=d)
    y = (X @ w_true > 0).astype(np.float64)
    return X, y


def test_fit_numpy_learns_and_logs_history():
    X, y = _separable()
    model, hist = fit_numpy(X, y, TrainConfig(lr=0.5, epochs=5))
    assert len(hist) == 5
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert evaluate(model, X, y)["accuracy"] > 0.95
    # StepLR: lr decays by gamma every step_size epochs
    assert hist[0]["lr"] == pytest.approx(0.5)
    assert hist[2]["lr"] == pytest.approx(0.05)
    assert hist[4]["lr"] == pytest.approx(0.005)


def test_fit_numpy_deterministic():
    X, y = _separable()
    m1, _ = fit_numpy(X, y, TrainConfig(seed=7))
    m2, _ = fit_numpy(X, y, TrainConfig(seed=7))
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias


def test_fit_dataframe(spark):
    X, y = _separable(n=200, d=8)
    pdf = pd.DataFrame(
        {"features": [row.tolist() for row in X], "label": y}
    )
    df = spark.createDataFrame(pdf)
    model, hist = fit_dataframe(df, TrainConfig(lr=0.5, epochs=3))
    assert model.n_features == 8
    assert evaluate(model, X, y)["accuracy"] > 0.9


def test_fit_dataframe_driver_size_guard(spark):
    """fit_dataframe is driver-sized BY CONTRACT (verdict r9 #4):
    an input above max_driver_rows raises with a pointer to the
    distributed path instead of silently toPandas-ing the corpus."""
    X, y = _separable(n=50, d=4)
    pdf = pd.DataFrame(
        {"features": [row.tolist() for row in X], "label": y}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="fit_sharded"):
        fit_dataframe(df, TrainConfig(epochs=1), max_driver_rows=10)
    # explicit opt-out still trains
    model, _ = fit_dataframe(
        df, TrainConfig(lr=0.5, epochs=2), max_driver_rows=None
    )
    assert model.n_features == 4


def test_random_search_picks_best_and_is_seeded(spark):
    X, y = _separable(n=300, d=8, seed=3)
    cfg, metrics, trials = random_search(
        spark, X, y, n_trials=4, base_cfg=TrainConfig(epochs=2), seed=11
    )
    assert len(trials) == 4
    assert metrics["loss"] == min(t["loss"] for t in trials)
    cfg2, metrics2, trials2 = random_search(
        spark, X, y, n_trials=4, base_cfg=TrainConfig(epochs=2), seed=11
    )
    assert cfg == cfg2 and trials == trials2


def test_fit_sharded_matches_single_node_quality(spark):
    X, y = _separable(n=600, d=8, seed=5)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(y)),
            "features": [row.tolist() for row in X],
            "label": y,
        }
    )
    df = spark.createDataFrame(pdf)
    model, report = fit_sharded(
        df, TrainConfig(lr=0.5, epochs=3), n_shards=4, n_features=8
    )
    assert set(report["shard"]) == {0, 1, 2, 3}
    assert report["n"].sum() == 600
    assert evaluate(model, X, y)["accuracy"] > 0.9
    # deterministic across runs
    model2, _ = fit_sharded(
        df, TrainConfig(lr=0.5, epochs=3), n_shards=4, n_features=8
    )
    assert np.array_equal(model.weights, model2.weights)


def test_fit_sharded_multi_round_improves(spark):
    X, y = _separable(n=400, d=8, seed=9)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(y)),
            "features": [r.tolist() for r in X],
            "label": y,
        }
    )
    df = spark.createDataFrame(pdf)
    one, _ = fit_sharded(df, TrainConfig(lr=0.2, epochs=1), n_shards=4, n_features=8)
    three, _ = fit_sharded(
        df, TrainConfig(lr=0.2, epochs=1), n_shards=4, n_features=8, rounds=3
    )
    assert evaluate(three, X, y)["loss"] <= evaluate(one, X, y)["loss"]


def test_registry_lifecycle(tmp_path):
    reg = ModelRegistry(str(tmp_path / "reg"))
    m1 = LogisticHead(weights=np.array([1.0, 2.0]), bias=0.5)
    m2 = LogisticHead(weights=np.array([3.0, 4.0]), bias=-1.0)
    v1 = reg.log_model(m1, "cv", params={"lr": 0.1}, metrics={"loss": 0.3})
    v2 = reg.log_model(m2, "cv", metrics={"loss": 0.2})
    assert (v1.version, v2.version) == (1, 2)
    reg.promote("cv", 1)
    loaded, mv = reg.load("cv")
    assert mv.version == 1 and np.array_equal(loaded.weights, m1.weights)
    # promoting v2 archives v1
    reg.promote("cv", 2)
    _, mv2 = reg.load("cv")
    assert mv2.version == 2
    stages = {v.version: v.stage for v in reg.search("cv")}
    assert stages == {1: "Archived", 2: "Production"}
    with pytest.raises(LookupError):
        reg.load("cv", stage="Staging")


def test_serving_roundtrip():
    pdf = pd.DataFrame({"path": ["a.jpg", "b.jpg"], "content": [b"\x10" * 32, b"\xf0" * 32]})
    payload = to_rest_payload(pdf)
    back = parse_rest_payload(payload)
    assert list(back["content"]) == list(pdf["content"])
    model = LogisticHead(weights=np.full(256, 0.1), bias=0.0)
    resp = json.loads(score_rest_payload(model, payload))
    assert len(resp["predictions"]) == 2
    # higher bytes → higher features → higher score under positive weights
    assert resp["predictions"][1] > resp["predictions"][0]


def test_train_register_score_pipeline(spark, tmp_path):
    """EP2 + EP3 end to end: content → features (U4) → train (M4) →
    registry (M7) → load Production → score_with (U3) over a DataFrame."""
    from computer_vision_foundations_spark.operators.score import score_with
    from computer_vision_foundations_spark.operators.transform import (
        to_training_batches,
    )

    rows = []
    for i in range(120):
        label = i % 2
        byte = 200 if label else 20
        rows.append((f"/img/{i}.jpg", bytes([byte]) * 64, label))
    df = spark.createDataFrame(rows, "path string, content binary, label int")

    feats = to_training_batches(df.select("content", "label"))
    model, _ = fit_dataframe(
        feats, TrainConfig(lr=1.0, epochs=4), n_features=256
    )
    reg = ModelRegistry(str(tmp_path / "reg"))
    v = reg.log_model(model, "pipeline")
    reg.promote("pipeline", v.version)
    prod, _ = reg.load("pipeline")

    scored = score_with(df, content_predict_fn(prod), input_cols=["content"])
    out = scored.select("path", "score").collect()
    assert len(out) == 120
    hi = [r.score for r in out if int(r.path.split("/")[-1].split(".")[0]) % 2 == 1]
    lo = [r.score for r in out if int(r.path.split("/")[-1].split(".")[0]) % 2 == 0]
    assert min(hi) > max(lo)


def test_tpe_search_seeded_and_adaptive(spark):
    """TPE: deterministic for a seed, respects the space bounds, runs
    the full budget, and its post-startup proposals concentrate vs the
    startup draws (the Parzen model steers toward the good region)."""
    from computer_vision_foundations_spark.ml import tpe_search

    X, y = _separable(n=300, d=8, seed=3)
    space = {"lr": (1e-4, 0.5)}
    cfg, metrics, trials = tpe_search(
        spark, X, y, n_trials=8, n_startup=3, space=space, seed=5
    )
    assert len(trials) == 8
    assert all(1e-4 <= t["lr"] <= 0.5 for t in trials)
    cfg2, metrics2, trials2 = tpe_search(
        spark, X, y, n_trials=8, n_startup=3, space=space, seed=5
    )
    assert [t["lr"] for t in trials] == [t["lr"] for t in trials2]
    assert metrics == metrics2
    # best found is at least as good as the best pure-startup trial
    assert metrics["loss"] <= min(t["loss"] for t in trials[:3])


def test_mlflow_registry_import_guard(tmp_path):
    """Without mlflow installed the adapter must fail fast with an
    actionable ImportError; with mlflow it must satisfy the same
    contract as the directory backend (exercised below)."""
    from computer_vision_foundations_spark.ml import (
        HAVE_MLFLOW,
        MlflowModelRegistry,
    )

    if not HAVE_MLFLOW:
        with pytest.raises(ImportError, match="mlflow"):
            MlflowModelRegistry()
        pytest.skip("mlflow not installed; adapter contract not exercised")
    _registry_contract(MlflowModelRegistry(tracking_uri=f"file://{tmp_path}/mlruns"))


def test_directory_registry_contract(tmp_path):
    _registry_contract(ModelRegistry(str(tmp_path / "reg")))


def _registry_contract(reg):
    """Backend-agnostic registry contract: versioning, promotion with
    archive-existing, stage resolution, newest-first search."""
    m1 = LogisticHead.zeros(4)
    v1 = reg.log_model(m1, "contract", params={"lr": "0.1"}, metrics={"loss": 1.0})
    v2 = reg.log_model(m1, "contract", params={"lr": "0.2"}, metrics={"loss": 0.5})
    assert (v1.version, v2.version) == (1, 2)
    reg.promote("contract", 1, "Production")
    reg.promote("contract", 2, "Production")
    stages = {v.version: v.stage for v in reg.search("contract")}
    assert stages == {1: "Archived", 2: "Production"}
    model, mv = reg.load("contract", stage="Production")
    assert mv.version == 2
    assert model.to_dict() == m1.to_dict()


def test_model_server_live_endpoint():
    """M8 live endpoint: the reference's client cell against a real
    local HTTP server — bearer auth, records payload, predictions
    response, 401/404/400 error paths."""
    import json as _json
    import urllib.error
    import urllib.request

    from computer_vision_foundations_spark.ml.serving import ModelServer

    pdf = pd.DataFrame(
        {"path": ["a.jpg", "b.jpg"], "content": [b"\x10" * 32, b"\xf0" * 32]}
    )
    payload = to_rest_payload(pdf).encode("utf-8")
    model = LogisticHead(weights=np.full(256, 0.1), bias=0.0)
    with ModelServer(model, model_name="cv", token="secret") as url:
        req = urllib.request.Request(
            url,
            data=payload,
            headers={
                "Authorization": "Bearer secret",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            body = _json.loads(resp.read())
        assert len(body["predictions"]) == 2
        assert body["predictions"][1] > body["predictions"][0]

        # wrong token -> 401
        bad = urllib.request.Request(
            url, data=payload, headers={"Authorization": "Bearer nope"}
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401

        # wrong path -> 404
        bad_url = url.replace("/cv/", "/other/")
        req404 = urllib.request.Request(
            bad_url, data=payload, headers={"Authorization": "Bearer secret"}
        )
        try:
            urllib.request.urlopen(req404, timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # malformed body -> 400
        req400 = urllib.request.Request(
            url, data=b"not json", headers={"Authorization": "Bearer secret"}
        )
        try:
            urllib.request.urlopen(req400, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
