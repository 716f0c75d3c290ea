"""Model registry (reference M7, `04a_Model Deployment.py:114-214`).

The reference logs runs to MLflow, registers the best model, promotes
it None → Production, and archives the previous Production version.
This module provides those stage-transition semantics over a plain
directory (JSON metadata + model payload) so the engine has a working
registry with zero dependencies; an MLflow adapter can wrap the same
calls when mlflow is installed (import-guarded flag exported for
callers that want to branch).

Layout::

    root/<name>/v<k>/model.json   — LogisticHead payload
    root/<name>/v<k>/meta.json    — params, metrics, stage, version

Versions are monotonically increasing integers (not wall-clock), so
"latest" and promotion order are deterministic.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from computer_vision_foundations_spark.ml.model import LogisticHead

try:  # pragma: no cover - mlflow is absent in the test container
    import mlflow  # noqa: F401

    HAVE_MLFLOW = True
except Exception:  # pragma: no cover
    HAVE_MLFLOW = False


@dataclass(frozen=True)
class ModelVersion:
    name: str
    version: int
    stage: str
    params: dict
    metrics: dict

    @property
    def key(self) -> str:
        return f"{self.name}/v{self.version}"


class ModelRegistry:
    """Directory-backed registry with MLflow-style stages."""

    STAGES = ("None", "Staging", "Production", "Archived")

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths --------------------------------------------------------
    def _model_dir(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v{version}")

    def _versions(self, name: str) -> list[int]:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if d.startswith("v") and d[1:].isdigit():
                out.append(int(d[1:]))
        return sorted(out)

    def _read_meta(self, name: str, version: int) -> dict:
        with open(os.path.join(self._model_dir(name, version), "meta.json")) as f:
            return json.load(f)

    def _write_meta(self, name: str, version: int, meta: dict) -> None:
        with open(
            os.path.join(self._model_dir(name, version), "meta.json"), "w"
        ) as f:
            json.dump(meta, f, indent=1, sort_keys=True)

    # -- API ----------------------------------------------------------
    def log_model(
        self,
        model: LogisticHead,
        name: str,
        params: dict | None = None,
        metrics: dict | None = None,
    ) -> ModelVersion:
        """Log a new version in stage ``None`` (the reference's
        ``register_model`` + run logging, `03a_Model Training.py:443-450`)."""
        version = (self._versions(name) or [0])[-1] + 1
        d = self._model_dir(name, version)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "model.json"), "w") as f:
            json.dump(model.to_dict(), f)
        meta = {
            "name": name,
            "version": version,
            "stage": "None",
            "params": params or {},
            "metrics": metrics or {},
        }
        self._write_meta(name, version, meta)
        return ModelVersion(name, version, "None", meta["params"], meta["metrics"])

    def promote(
        self, name: str, version: int, stage: str = "Production"
    ) -> ModelVersion:
        """Stage transition; promoting to Production archives the
        current Production version (`04a_Model Deployment.py:158-214`)."""
        if stage not in self.STAGES:
            raise ValueError(f"unknown stage {stage!r}; one of {self.STAGES}")
        if stage == "Production":
            for v in self._versions(name):
                m = self._read_meta(name, v)
                if m["stage"] == "Production" and v != version:
                    m["stage"] = "Archived"
                    self._write_meta(name, v, m)
        meta = self._read_meta(name, version)
        meta["stage"] = stage
        self._write_meta(name, version, meta)
        return ModelVersion(name, version, stage, meta["params"], meta["metrics"])

    def load(
        self, name: str, stage: str = "Production", version: int | None = None
    ) -> tuple[LogisticHead, ModelVersion]:
        """Load by explicit version, else the latest version in ``stage``
        (the reference's ``models:/name/Production`` URI resolution)."""
        if version is None:
            matches = [
                v
                for v in self._versions(name)
                if self._read_meta(name, v)["stage"] == stage
            ]
            if not matches:
                raise LookupError(f"no {name} version in stage {stage}")
            version = matches[-1]
        with open(os.path.join(self._model_dir(name, version), "model.json")) as f:
            model = LogisticHead.from_dict(json.load(f))
        m = self._read_meta(name, version)
        return model, ModelVersion(
            name, version, m["stage"], m["params"], m["metrics"]
        )

    def search(self, name: str) -> list[ModelVersion]:
        """All versions, newest first (the reference's
        ``search_runs(order_by=['start_time DESC'])``)."""
        out = []
        for v in reversed(self._versions(name)):
            m = self._read_meta(name, v)
            out.append(
                ModelVersion(name, v, m["stage"], m["params"], m["metrics"])
            )
        return out


class MlflowModelRegistry:
    """MLflow-backed adapter exposing the SAME API as ``ModelRegistry``
    (log_model / promote / load / search), so callers switch backends
    with one constructor (reference M7 parity, `04a_Model
    Deployment.py:114-214`: run logging, register, None → Production
    with archive-existing, `models:/name/stage` resolution).

    Import-guarded: constructing it without mlflow installed raises
    ``ImportError`` immediately rather than failing mid-pipeline. The
    model payload is the same JSON dict the directory backend writes
    (logged as a run artifact ``model.json``); stages use MLflow's
    model-version stage transitions with ``archive_existing_versions``
    on Production promotion, matching ``ModelRegistry.promote``.
    """

    STAGES = ModelRegistry.STAGES

    def __init__(
        self,
        tracking_uri: str | None = None,
        experiment: str = "computer_vision_foundations_spark",
    ):
        if not HAVE_MLFLOW:
            raise ImportError(
                "MlflowModelRegistry requires mlflow; pip install mlflow "
                "or use the zero-dependency ModelRegistry(root_dir)."
            )
        from mlflow.tracking import MlflowClient

        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        self._client = MlflowClient()
        exp = self._client.get_experiment_by_name(experiment)
        self._experiment_id = (
            exp.experiment_id
            if exp is not None
            else self._client.create_experiment(experiment)
        )

    def log_model(
        self,
        model: LogisticHead,
        name: str,
        params: dict | None = None,
        metrics: dict | None = None,
    ) -> ModelVersion:
        run = self._client.create_run(self._experiment_id)
        run_id = run.info.run_id
        for k, v in (params or {}).items():
            self._client.log_param(run_id, k, v)
        for k, v in (metrics or {}).items():
            self._client.log_metric(run_id, k, float(v))
        self._client.log_dict(run_id, model.to_dict(), "model.json")
        self._client.set_terminated(run_id)
        try:
            self._client.create_registered_model(name)
        except Exception:
            pass  # already registered
        mv = self._client.create_model_version(
            name=name, source=f"runs:/{run_id}/model.json", run_id=run_id
        )
        return ModelVersion(name, int(mv.version), "None", params or {}, metrics or {})

    def promote(
        self, name: str, version: int, stage: str = "Production"
    ) -> ModelVersion:
        if stage not in self.STAGES:
            raise ValueError(f"unknown stage {stage!r}; one of {self.STAGES}")
        mv = self._client.transition_model_version_stage(
            name=name,
            version=str(version),
            stage=stage,
            archive_existing_versions=(stage == "Production"),
        )
        meta = self._meta_of(mv)
        return ModelVersion(name, int(mv.version), stage, *meta)

    def load(
        self, name: str, stage: str = "Production", version: int | None = None
    ) -> tuple[LogisticHead, ModelVersion]:
        import json as _json

        from mlflow.artifacts import download_artifacts

        if version is None:
            matches = [
                mv
                for mv in self._client.search_model_versions(f"name='{name}'")
                if mv.current_stage == stage
            ]
            if not matches:
                raise LookupError(f"no {name} version in stage {stage}")
            mv = max(matches, key=lambda m: int(m.version))
        else:
            mv = self._client.get_model_version(name, str(version))
        path = download_artifacts(
            run_id=mv.run_id, artifact_path="model.json"
        )
        with open(path) as f:
            model = LogisticHead.from_dict(_json.load(f))
        meta = self._meta_of(mv)
        return model, ModelVersion(name, int(mv.version), mv.current_stage, *meta)

    def search(self, name: str) -> list[ModelVersion]:
        out = []
        for mv in sorted(
            self._client.search_model_versions(f"name='{name}'"),
            key=lambda m: -int(m.version),
        ):
            meta = self._meta_of(mv)
            out.append(
                ModelVersion(name, int(mv.version), mv.current_stage, *meta)
            )
        return out

    def _meta_of(self, mv) -> tuple[dict, dict]:
        run = self._client.get_run(mv.run_id)
        return dict(run.data.params), dict(run.data.metrics)
