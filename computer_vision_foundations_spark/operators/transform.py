"""Batch pandas map operator (reference U4: Petastorm ``TransformSpec``).

The reference converts cached rows to training tensors with a Petastorm
``TransformSpec(fn, edit_fields, selected_fields)`` — a pandas-batch →
pandas-batch function with a declared output schema (`03a_Model
Training.py:136-178`: decode JPG → Resize 224 → ToTensor → Normalize →
``features float32[3,224,224], label float32``). Spark's native twin of
that contract is ``mapInPandas(fn, schema)``: same pandas-in/pandas-out
batches, same declared schema, but executed inside the Spark plan over
Arrow — no Petastorm cache or second storage hop required.

``to_training_batches`` is the engine operator:

- ``transform_fn`` is any pandas→pandas function (picklable). The
  default transform decodes ``content`` bytes into a normalized float
  feature vector and casts ``label`` to float32 — the reference's
  TransformSpec semantics with tensors flattened to ``array<float>``
  plus a ``shape`` column (SURVEY §1.2's flat-tensor representation).
- Decode backend: Pillow/torchvision are not in this container, so the
  default transform uses the DETERMINISTIC FAKE byte-strip decoder from
  ``functions.image`` (clearly marked there; swap-in is one function).
  The Spark-side plumbing — schema, Arrow batching, partition layout —
  is real and tested either way.
- Scale: ``mapInPandas`` is a narrow transformation — no shuffle; each
  Arrow batch is transformed where it sits. Pair with
  ``sinks.write_row_grouped_parquet`` (R3) to produce shard-sized
  row groups for a downstream data loader.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from computer_vision_foundations_spark.functions.image import _fake_pixels

# The reference's TransformSpec output fields (`03a_Model
# Training.py:167-178`), tensors flattened per SURVEY §1.2.
TRAINING_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("shape", T.ArrayType(T.IntegerType())),
        T.StructField("label", T.FloatType()),
    ]
)


def default_transform(
    batch: pd.DataFrame,
    content_col: str = "content",
    label_col: str = "label",
    n_features: int = 256,
) -> pd.DataFrame:
    """Decode → normalize → (features, shape, label) for one batch.

    Mirrors `03a_Model Training.py:144-160` (``transform_row``): per-row
    image decode + scale to [0,1] floats. The real pipeline's
    Resize/Normalize steps live here too when an image stack is
    installed; without one the fake byte-strip decode keeps the output
    deterministic.
    """
    feats = [
        np.asarray(_fake_pixels(b, n_features), dtype=np.float32) / 255.0
        for b in batch[content_col]
    ]
    labels = (
        batch[label_col].astype("float32")
        if label_col in batch.columns
        else pd.Series(np.zeros(len(batch), dtype=np.float32))
    )
    return pd.DataFrame(
        {
            "features": [f.tolist() for f in feats],
            "shape": [[len(f)] for f in feats],
            "label": labels.to_numpy(),
        }
    )


def to_training_batches(
    df: DataFrame,
    transform_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    schema: T.StructType | str = TRAINING_BATCH_SCHEMA,
    content_col: str = "content",
    label_col: str = "label",
) -> DataFrame:
    """Apply a TransformSpec-style pandas batch map inside the plan.

    ``df.mapInPandas(fn, schema)`` — the Spark-native equivalent of the
    Petastorm ``TransformSpec`` contract (`03a_Model
    Training.py:136-178`): pandas batches in, pandas batches with the
    declared ``schema`` out. Input column pruning happens automatically
    (Catalyst pushes the needed-column projection into the scan), so
    select only ``content``/``label`` upstream to keep Arrow transfer
    minimal.
    """
    fn = transform_fn or (
        lambda b: default_transform(b, content_col=content_col, label_col=label_col)
    )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield fn(batch)

    return df.mapInPandas(_mapper, schema)
