"""ML layer (reference M2-M9, SURVEY §2.9) — torch-optional.

The reference's ML stack is MobileNetV2 transfer learning trained with
a BCE/SGD/StepLR loop (`03a_Model Training.py:210-401`), tuned with
Hyperopt SparkTrials (`:415-450`), scaled out with Horovod
(`:487-575`), and tracked/promoted through MLflow (`:594-602`,
`04a_Model Deployment.py:114-214`). This package re-expresses each as a
DataFrame-in/DataFrame-out (or plain-Python) component with the heavy
dependencies optional:

- :mod:`model` — the trainable head. A numpy logistic head is the
  always-available backend (this container has no torch); a
  torch-backed transfer model is import-guarded behind the same
  interface.
- :mod:`train` — the reference's exact loop semantics (minibatch SGD +
  momentum, BCE loss, StepLR schedule, per-epoch metrics) in numpy.
- :mod:`tune` — seeded loguniform random search AND a from-scratch
  TPE (Parzen-estimator) sampler, both parallelized as one Spark task
  per trial (SparkTrials semantics without the hyperopt dependency).
- :mod:`distributed` — data-parallel training as Spark dataflow:
  per-shard local SGD via ``applyInPandas`` + weighted parameter
  averaging (the Horovod-allreduce stand-in that is native to Spark).
- :mod:`registry` — file-based model registry with MLflow-style stage
  transitions (None → Production, archive on promote).
- :mod:`serving` — REST payload codec (records-oriented JSON, base64
  content) and a local scoring endpoint stand-in.
"""

from computer_vision_foundations_spark.ml.model import (
    HAVE_TORCH,
    LogisticHead,
    content_predict_fn,
)
from computer_vision_foundations_spark.ml.train import (
    TrainConfig,
    evaluate,
    fit_dataframe,
    fit_numpy,
)
from computer_vision_foundations_spark.ml.tune import random_search, tpe_search
from computer_vision_foundations_spark.ml.distributed import fit_sharded
from computer_vision_foundations_spark.ml.registry import (
    HAVE_MLFLOW,
    MlflowModelRegistry,
    ModelRegistry,
)
from computer_vision_foundations_spark.ml.serving import (
    parse_rest_payload,
    score_rest_payload,
    to_rest_payload,
)
from computer_vision_foundations_spark.ml.edge import (
    edge_predict,
    edge_predict_subprocess,
    export_edge_bundle,
)

__all__ = [
    "HAVE_TORCH",
    "LogisticHead",
    "content_predict_fn",
    "TrainConfig",
    "evaluate",
    "fit_dataframe",
    "fit_numpy",
    "random_search",
    "tpe_search",
    "fit_sharded",
    "ModelRegistry",
    "MlflowModelRegistry",
    "HAVE_MLFLOW",
    "parse_rest_payload",
    "score_rest_payload",
    "to_rest_payload",
    "export_edge_bundle",
    "edge_predict",
    "edge_predict_subprocess",
]
