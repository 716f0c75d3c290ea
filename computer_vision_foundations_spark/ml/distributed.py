"""Distributed data-parallel training (reference M6,
`03a_Model Training.py:487-575`).

The reference scales out with Horovod: each worker trains on its
Petastorm shard (``cur_shard=hvd.rank()``) and gradients are averaged
with ring allreduce. The Spark-native re-expression keeps the exact
data-parallel shape but uses the engine's own primitives:

- *sharding* = a deterministic ``pmod(xxhash64(id), n_shards)`` column
  (every executor sees a disjoint, balanced slice — the
  ``cur_shard``/``shard_count`` contract);
- *local training* = ``applyInPandas`` over ``groupBy(shard)`` — one
  full local-SGD fit per shard, executed where the shard's data lives;
- *allreduce* = weighted parameter averaging of the per-shard heads
  (one tiny O(n_shards × dim) collect — model-sized, never data-sized).

This is one round of "local SGD / model averaging"; ``rounds > 1``
re-broadcasts the averaged head as the next round's init, which is
exactly periodic-averaging SGD. For convex heads (logistic) averaging
is well-behaved; it is also how the reference's allreduce-mean of
gradients degrades when synchronization is per-epoch rather than
per-batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.ml.model import (
    LogisticHead,
    features_matrix,
)
from computer_vision_foundations_spark.ml.train import TrainConfig, fit_numpy

_SHARD_RESULT_SCHEMA = (
    "shard int, n long, bias double, loss double, weights array<double>"
)


def fit_sharded(
    df: DataFrame,
    cfg: TrainConfig = TrainConfig(),
    n_shards: int = 4,
    id_col: str = "doc_id",
    features_col: str = "features",
    label_col: str = "label",
    n_features: int = 256,
    rounds: int = 1,
) -> tuple[LogisticHead, pd.DataFrame]:
    """Data-parallel fit: per-shard local SGD + weighted averaging.

    Returns the averaged head and the per-shard report (shard sizes,
    final local losses) from the last round. Deterministic: sharding is
    hash-based, every local fit is seeded with ``cfg.seed + shard``.
    """
    sharded = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(features_col).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )

    init = LogisticHead.zeros(n_features)
    report = pd.DataFrame()
    spark = df.sparkSession
    for _ in range(max(rounds, 1)):
        init_state = (init.weights.tolist(), float(init.bias))
        b = spark.sparkContext.broadcast(init_state)

        def train_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            X = features_matrix(pdf, "features", n_features)
            y = pdf["label"].to_numpy(dtype=np.float64)
            w0, b0 = b.value
            start = LogisticHead(
                weights=np.asarray(w0, dtype=np.float64), bias=b0
            )
            local_cfg = TrainConfig(**{**vars(cfg), "seed": cfg.seed + shard})
            model, hist = fit_numpy(X, y, local_cfg, init=start)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "n": [len(y)],
                    "bias": [model.bias],
                    "loss": [hist[-1]["loss"]],
                    "weights": [model.weights.tolist()],
                }
            )

        report = (
            sharded.groupBy("shard")
            .applyInPandas(train_shard, _SHARD_RESULT_SCHEMA)
            .toPandas()
            .sort_values("shard")
            .reset_index(drop=True)
        )
        total = float(report["n"].sum())
        W = np.stack([np.asarray(w, dtype=np.float64) for w in report["weights"]])
        wts = report["n"].to_numpy(dtype=np.float64) / total
        init = LogisticHead(
            weights=W.T @ wts,
            bias=float(np.dot(report["bias"].to_numpy(), wts)),
            meta={"n_shards": n_shards, "rounds": rounds, "n": int(total)},
        )
    return init, report.drop(columns=["weights"])
