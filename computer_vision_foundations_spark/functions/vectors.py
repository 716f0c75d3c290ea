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
    """a · b. The default (``dim=None``) is an ``aggregate(zip_with())``
    fold — one expression node whose evaluator loops the arrays. With
    ``dim`` the sum is UNROLLED into element_at × dim flat arithmetic.

    MEASURED (sf0.1, 64-dim, local[32]): the fold is 5-6× FASTER than
    the unrolled form for every join-shaped workload (q27 1.1 s vs
    6.8 s; q28 2.4 s vs 11.6 s). The ~200-node unrolled tree drops the
    stage out of whole-stage codegen anyway (executed plan shows no
    WholeStageCodegen span), and a 200-node interpreted tree evaluates
    far slower than one HOF node's tight loop — plus Catalyst
    analysis/codegen time scales with tree size. Leave ``dim`` unset in
    hot paths; it is kept because both forms sum in ascending index
    order and are bit-identical (to each other and to DuckDB's
    ``list_dot_product``), which the differential oracle relies on.
    """
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        return _sum_terms(
            [
                F.element_at(ac, i).cast("double")
                * F.element_at(bc, i).cast("double")
                for i in range(1, dim + 1)
            ]
        )
    return F.aggregate(
        F.zip_with(to_double_array(ac), to_double_array(bc), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    if dim is not None:
        sq = [
            F.element_at(ac, i).cast("double")
            * F.element_at(ac, i).cast("double")
            for i in range(1, dim + 1)
        ]
        return F.sqrt(_sum_terms(sq))
    return F.sqrt(
        F.aggregate(to_double_array(ac), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Cosine similarity in double precision (0 for zero-norm inputs).

    Leave ``dim`` unset in hot paths — the HOF fold measures 5-6×
    faster than the unrolled form; see ``dot_product``.
    """
    num = dot_product(a, b, dim)
    den = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))


def cosine_from_norms(
    a: Column | str,
    b: Column | str,
    norm_a: Column | str,
    norm_b: Column | str,
    dim: int | None = None,
) -> Column:
    """Cosine given PRECOMPUTED per-side L2 norms.

    The scale form for join-shaped similarity: compute ``l2_norm`` once
    per vector BEFORE the join (n + m sqrts instead of n·m·2), keeping
    the pair-side expression to just the dot product. Bit-identical to
    ``cosine_similarity``: same multiplies, same order. Leave ``dim``
    unset in hot paths (see ``dot_product``).
    """
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    num = dot_product(a, b, dim)
    den = na * nb
    return F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))
