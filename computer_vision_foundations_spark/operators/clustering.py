"""Distributed k-means over embedding columns (Lloyd's algorithm).

Two jobs in one module:

1. **Semantic clustering for its own sake** — "semantic dedup"
   pipelines cluster embeddings and then dedup/downsample inside each
   cluster (SemDeDup-style), and corpus analyses bucket documents by
   embedding cluster.
2. **Training the coarse quantizer** — ``ivf_flat_knn`` and
   ``ivf_pq_topk`` take ``centroids`` as input; the seeded-gaussian
   default is a stand-in, and this module is the in-engine way to fit
   REAL centroids on a corpus sample.

Scale shape: centroids are model-sized (k × dim floats) and live on
the driver between iterations — the textbook compromise (Spark MLlib's
KMeans does the same). Each Lloyd iteration is:

- assignment: one Arrow-batched matmul projection
  (``argmin ||c||² − 2·v·c``, the shared trick of the IVF/PQ family);
- update: ONE hash aggregate — per-cluster element-wise vector sums as
  ``dim`` unrolled ``sum(element_at(v, i))`` columns + a count, with
  map-side partial aggregation, so the shuffle carries k rows of
  dim+1 doubles per map partition and vectors are never shuffled;
- the k × (dim+1) result is collected (model-sized, allowed by the
  engine's no-DATA-collect rule) and becomes the next centroid set.
  Empty clusters keep their previous centroid.

``kmeans_update_table`` exposes a single update step as a lazy
DataFrame in FLATTENED form ``(cluster, pos, mean, n_members)`` so the
step itself is differentially checkable against a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["kmeans_assign", "kmeans_update_table", "kmeans_fit"]


def _assign_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Nearest-centroid index as an Arrow-batched matmul (first index
    on ties, matching the IVF oracle's ``list_position(l, list_min(l))``)."""
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)

    @pandas_udf("int")
    def assign_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        d = cnorm[None, :] - 2.0 * (mat @ cmat.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign_udf(F.col(vec_col))


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Add the nearest-centroid cluster id (one narrow projection)."""
    return df.withColumn(out_col, _assign_expr(vec_col, centroids))


def kmeans_update_table(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """One Lloyd update as a lazy DataFrame:
    ``(cluster, pos, mean, n_members)`` — the new centroid value for
    every (cluster, dimension) among clusters with ≥1 member. Flattened
    so a SQL oracle can hash-compare it; ``kmeans_fit`` consumes the
    same aggregate un-rounded."""
    dim = len(centroids[0])
    assigned = df.select(
        _assign_expr(vec_col, centroids).alias("cluster"), F.col(vec_col).alias("_v")
    )
    sums = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[
            F.sum(F.element_at("_v", i + 1).cast("double")).alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    mean_arr = F.array(
        *[F.col(f"_s{i}") / F.col("n_members") for i in range(dim)]
    )
    out = sums.select(
        "cluster",
        F.posexplode(mean_arr).alias("pos", "mean"),
        "n_members",
    ).select("cluster", "pos", "mean", "n_members")
    if round_digits is not None:
        out = out.withColumn("mean", F.round("mean", round_digits))
    return out


def kmeans_fit(
    df: DataFrame,
    dim: int,
    n_clusters: int,
    n_iter: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Fit k-means centroids (Lloyd). Deterministic for a seed: init is
    the engine's seeded gaussian (``similarity.random_centroids``)
    unless ``init`` is given; iterations stop early when no centroid
    moves more than ``tol`` (L∞). Returns the centroid list — feed it
    straight into ``ivf_flat_knn(centroids=...)`` / ``ivf_pq_topk``."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = [list(map(float, c)) for c in (init or random_centroids(dim, n_clusters, seed))]
    for _ in range(n_iter):
        rows = kmeans_update_table(df, cents, vec_col).collect()
        by_cluster: dict[int, list[tuple[int, float]]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], []).append((r["pos"], r["mean"]))
        moved = 0.0
        new_cents = [list(c) for c in cents]
        for cl, dims in by_cluster.items():
            vec = [m for _, m in sorted(dims)]
            moved = max(
                moved, max(abs(a - b) for a, b in zip(vec, cents[cl]))
            )
            new_cents[cl] = vec
        cents = new_cents
        if moved <= tol:
            break
    return cents
