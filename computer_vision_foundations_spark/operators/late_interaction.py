"""Late-interaction (MaxSim) retrieval scoring — ColBERT-style.

Single-vector retrieval (q27's brute-force kNN, the IVF/LSH family)
collapses a document to one embedding; late-interaction keeps a BAG
of token-level vectors per document and scores

    MaxSim(q, d) = Σ_{i ∈ q tokens}  max_{j ∈ d tokens} cos(q_i, d_j)

(Khattab & Zaharia 2020) — each query token picks its best-matching
document token, so partial/multi-topic matches score where a single
pooled vector washes out. The engine's tensor representation is a
flat ``array<float>`` + shape metadata (SURVEY §1.2), so a
T-token×D-dim matrix is one ``T·D`` array and token ``i`` is
``slice(vec, i·D+1, D)`` — no explode, no per-token rows.

Spark-first shape: the T×T cosine grid is built STATICALLY in Python
as ``greatest()``-over-j / sum-over-i of HOF-fold cosines on array
slices — one JVM expression per pair, evaluated map-side over
``corpus ⋈ broadcast(probes)`` exactly like brute_force_knn; the only
shuffle is the per-probe top-k window. Sum order is i-ascending and
each cosine is the same fold DuckDB's ``list_cosine_similarity``
reproduces, so the oracle unrolls the identical grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.vectors import (
    cosine_similarity,
)
from computer_vision_foundations_spark.operators.similarity import (
    _topk_per_query,
)

__all__ = ["maxsim_topk", "maxsim_oracle_sql"]


def _maxsim_expr(qv: Column, dv: Column, n_tokens: int, dim: int) -> Column:
    """Σ_i max_j cos(slice_i(qv), slice_j(dv)) — static T×T grid."""
    terms = []
    for i in range(n_tokens):
        qi = F.slice(qv, i * dim + 1, dim)
        best = F.greatest(
            *[
                cosine_similarity(qi, F.slice(dv, j * dim + 1, dim))
                for j in range(n_tokens)
            ]
        )
        terms.append(best)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def maxsim_topk(
    corpus: DataFrame,
    probes: DataFrame,
    n_tokens: int = 8,
    dim: int = 8,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """``(probe_id, neighbor_id, maxsim, rank)`` — top-k documents per
    probe by MaxSim over ``n_tokens`` pseudo-token slices of ``dim``
    dims each. Ties break on neighbor id after rounding."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "maxsim",
            F.round(
                _maxsim_expr(F.col("_pv"), F.col("_cv"), n_tokens, dim),
                round_digits,
            ),
        )
    )
    return _topk_per_query(
        scored, k, "probe_id", "neighbor_id", score_col="maxsim"
    )


def maxsim_oracle_sql(
    table: str = "embeddings",
    n_probes: int = 3,
    n_tokens: int = 8,
    dim: int = 8,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin: the same statically-unrolled T×T cosine grid over
    1-based inclusive list slices."""

    def cos(i: int, j: int) -> str:
        qs = f"p.pv[{i * dim + 1}:{(i + 1) * dim}]"
        ds = f"e.{vec_col}[{j * dim + 1}:{(j + 1) * dim}]"
        return (
            f"list_cosine_similarity(CAST({qs} AS DOUBLE[]),"
            f" CAST({ds} AS DOUBLE[]))"
        )

    grid = " + ".join(
        "greatest(" + ", ".join(cos(i, j) for j in range(n_tokens)) + ")"
        for i in range(n_tokens)
    )
    return f"""
    WITH probes AS (SELECT {id_col} AS probe_id, {vec_col} AS pv
                    FROM {table} WHERE {id_col} < {n_probes})
    SELECT probe_id, neighbor_id, maxsim, rank FROM (
      SELECT p.probe_id, e.{id_col} AS neighbor_id,
             round({grid}, 6) AS maxsim,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round({grid}, 6) DESC, e.{id_col}) AS rank
      FROM {table} e CROSS JOIN probes p
      WHERE e.{id_col} <> p.probe_id) t
    WHERE rank <= {k}
    """
