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


def _sum_terms(terms: list[Column]) -> Column:
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_product(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """a · b. With ``dim`` the sum is UNROLLED into a flat codegen'd
    expression (element_at × dim); without it, an interpreted
    ``aggregate(zip_with(...))`` fold. Higher-order functions get no
    whole-stage codegen, so for fixed-width embedding columns the
    unrolled form is ~5-10× faster — always pass ``dim`` in hot paths.
    Summation order is ascending index in BOTH forms, so results are
    bit-identical between them (and to the DuckDB oracle's
    ``list_dot_product``).
    """
    a = to_double_array(a)
    b = to_double_array(b)
    if dim is not None:
        return _sum_terms(
            [F.element_at(a, i) * F.element_at(b, i) for i in range(1, dim + 1)]
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    a = to_double_array(a)
    if dim is not None:
        sq = [
            F.element_at(a, i) * F.element_at(a, i) for i in range(1, dim + 1)
        ]
        return F.sqrt(_sum_terms(sq))
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Cosine similarity in double precision (0 for zero-norm inputs).

    Pass ``dim`` when the embedding width is known (it almost always
    is) to stay inside whole-stage codegen — see ``dot_product``.
    """
    num = dot_product(a, b, dim)
    den = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))
