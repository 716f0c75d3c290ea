"""JVM-side vector math over ``array<float>`` / ``array<double>`` columns.

The engine's embedding representation is a flat ``array<float>`` column
(SURVEY §1.2: tensors become flat arrays + shape metadata). All math
here uses Catalyst higher-order functions (``zip_with`` +
``aggregate``) so dot products and norms run in the JVM without any
Python crossing — the scale path for similarity search over billions of
rows. A vectorized pandas-UDF alternative exists in
``operators/similarity.py`` for wide-batch rerank paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so accumulation is f64."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    a = to_double_array(a)
    b = to_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = to_double_array(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision (0 for zero-norm inputs)."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))
