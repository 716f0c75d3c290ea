"""Approximate-nearest-neighbor / similarity search over embeddings.

North-star extension (SURVEY §2.10). Two tiers:

- ``brute_force_knn``: exact top-k cosine between a (small) probe set
  and the full corpus. The probe side is broadcast — the corpus is
  scanned once, map-side, with JVM vector math; the only shuffle is the
  per-probe top-k (window over probe_id, k rows each). This is the
  correctness baseline and is already the right plan when probes ≪
  corpus (the common "query a handful of vectors against 100 TB" case).
- ``lsh_bucketed_knn``: random-hyperplane LSH (sign of dot with seeded
  random vectors → bucket id). Probes and corpus join on bucket id so
  only same-bucket candidates are scored — the scale path when the
  probe set is itself huge. Recall is tunable via n_planes/n_tables.

Seeded throughout; no driver-side collect of data rows.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.vectors import (
    cosine_from_norms,
    l2_norm,
)


def brute_force_knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self-matches).

    Returns ``(probe_id, neighbor_id, cos_sim, rank)``. Ties break on
    neighbor_id after rounding, so results are total-order
    deterministic (required by the differential oracle). Pass ``dim``
    (embedding width) to unroll the math into codegen'd expressions —
    see functions/vectors.py.

    Norms are computed per SIDE before the join (n + m sqrts), so the
    per-pair work is one dot product — not a full cosine per pair.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        l2_norm(vec_col, dim).alias("_pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(vec_col, dim).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_from_norms("_pv", "_cv", "_pn", "_cn", dim),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = bit vector of sign(v · r_i), as a long column.

    The plane coefficients are literals, so each dot product unrolls
    into a flat codegen'd ``Σ element_at(v, i) · c_i`` — no interpreted
    higher-order functions. Summation order is ascending index (matches
    the DuckDB oracle's ``list_dot_product``). Elements are cast to
    double individually — an array-level cast would be re-inlined at
    every element_at and blow the 64 KB codegen method limit (see
    functions/vectors.dot_product).
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        terms = [
            F.element_at(v, j + 1).cast("double") * F.lit(float(x))
            for j, x in enumerate(plane)
        ]
        dot = terms[0]
        for t in terms[1:]:
            dot = dot + t
        bucket = bucket + F.when(dot >= 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucketed_knn(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.

    Each of ``n_tables`` independent plane sets hashes every vector to
    a bucket; probe×corpus join on (table, bucket) generates candidates,
    deduped across tables, then exact cosine + per-probe top-k. Plan:
    two narrow projections + one equi-join shuffle on (table, bucket) +
    one window shuffle on probe_id — no cross product anywhere.
    """
    def with_buckets(df: DataFrame, side_id: str) -> DataFrame:
        # Norm once per vector, BEFORE the per-table fan-out and join.
        base = df.select(
            F.col(id_col).alias(side_id),
            F.col(vec_col).alias(f"_{side_id}_v"),
            l2_norm(vec_col, dim).alias(f"_{side_id}_n"),
        )
        rows = []
        for t in range(n_tables):
            planes = _random_planes(dim, n_planes, seed + t * 7919)
            rows.append(
                base.withColumns(
                    {
                        "_table": F.lit(t),
                        "_bucket": hyperplane_bucket(
                            F.col(f"_{side_id}_v"), planes
                        ),
                    }
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    pb = with_buckets(probes, "probe_id")
    cb = with_buckets(corpus, "neighbor_id")
    cands = (
        pb.join(cb, on=["_table", "_bucket"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id", "_probe_id_v", "_probe_id_n",
            "neighbor_id", "_neighbor_id_v", "_neighbor_id_n",
        )
        .distinct()
    )
    scored = cands.withColumn(
        "cos_sim",
        F.round(
            cosine_from_norms(
                "_probe_id_v", "_neighbor_id_v",
                "_probe_id_n", "_neighbor_id_n", dim,
            ),
            round_digits,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )
