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

    The unrolled form casts each ELEMENT to double (same value as
    casting the array) — an array-level cast re-emits its whole
    conversion loop at every ``element_at`` after projection collapse
    inlines it, which blows Janino's 64 KB method limit at dim=64 and
    silently drops the stage out of whole-stage codegen.
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

    Pass ``dim`` when the embedding width is known (it almost always
    is) to stay inside whole-stage codegen — see ``dot_product``.
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
    per vector BEFORE the join (n + m sqrts instead of n·m·2), and keep
    the pair-side expression to just the dot product — which also keeps
    the generated Java method for the join projection under Janino's
    64 KB limit at dim=64+ (one 3·dim-term cosine per pair blows it and
    silently falls back to interpreted eval). Bit-identical to
    ``cosine_similarity``: same multiplies, same order.
    """
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    num = dot_product(a, b, dim)
    den = na * nb
    return F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))
