"""Model-scoring operator (reference U3 semantics, Spark-idiomatic).

The reference scores images with ``mlflow.pyfunc.spark_udf`` wrapping a
pandas-DataFrame-in / pandas-Series-out model (`04a_Model
Deployment.py:65-105,231-237`), applied to ``struct(content)`` in a
stream. Our engine generalizes: ``score_with(df, predict_fn)`` wraps
any ``Callable[[pandas.DataFrame], pandas.Series]`` in a
scalar-iterator pandas UDF so per-executor model state loads once per
worker (not once per batch) and data crosses via Arrow.

Base64 sniffing matches the reference wrapper (`04a_Model
Deployment.py:92-93`): if ``content`` arrives as str it is
base64-decoded before prediction.
"""

from __future__ import annotations

import base64
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _decode_content(batch: pd.DataFrame, content_col: str) -> pd.DataFrame:
    col = batch[content_col]
    if len(col) and isinstance(col.iloc[0], str):
        batch = batch.assign(**{content_col: col.map(base64.b64decode)})
    return batch


def score_with(
    df: DataFrame,
    predict_fn: Callable[[pd.DataFrame], pd.Series],
    input_cols: list[str] | None = None,
    content_col: str = "content",
    output_col: str = "score",
    result_type: str = "double",
) -> DataFrame:
    """Add ``output_col`` = predict_fn(pandas batch of input_cols).

    ``predict_fn`` must be picklable (module-level or closure over
    picklable state); heavyweight model loading should happen lazily
    inside it on first call — the iterator UDF keeps it alive across
    batches within a worker.
    """
    cols = input_cols or [content_col]

    @pandas_udf(result_type)
    def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for batch in it:
            if content_col in batch.columns:
                batch = _decode_content(batch, content_col)
            yield pd.Series(predict_fn(batch))

    return df.withColumn(output_col, _score(F.struct(*[F.col(c) for c in cols])))
