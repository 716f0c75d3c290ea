"""Internal cluster-quality metrics: simplified silhouette and
Davies-Bouldin.

The clustering family (k-means `operators/clustering.py`, SemDeDup
blocking, IVF coarse quantizers, DBSCAN) needs a VALIDATION loop: is
k right, did the fit converge somewhere useful, which clusters are
mush? Two standard internal indices, both centroid-based so they run
in one corpus pass (the full silhouette's pairwise form is O(n²) —
its "simplified" centroid variant, Hruschka et al. 2004, is the one
production pipelines compute):

- **simplified silhouette** per point: ``s = (b − a) / max(a, b)``
  with ``a`` the distance to the OWN centroid and ``b`` the smallest
  distance to any OTHER centroid; averaged per cluster. s → 1 means
  tight and well-separated, s ≈ 0 means boundary mush.
- **Davies-Bouldin** per cluster: ``R_i = max_{j≠i} (S_i + S_j) /
  M_ij`` with S the mean member→centroid distance and M the
  centroid-centroid distance; the DB index is the mean of R_i (lower
  is better).

Centroids enter the plan as LITERALS (the engine's LSH-plane /
PQ-codebook / IVF convention), so every distance is a higher-order
``aggregate(zip_with())`` fold in codegen — no UDF — and the whole
computation replays verbatim in the SQL oracle.

Spark-first shape: one narrow pass computes per-point (cluster, a, b)
→ one |k|-row aggregate; Davies-Bouldin adds a |k|² literal-sized
join. The corpus shuffles once, as (cluster, double, double) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.vectors import (
    dot_product,
    to_double_array,
)

__all__ = [
    "simplified_silhouette",
    "davies_bouldin",
    "silhouette_oracle_sql",
    "davies_bouldin_oracle_sql",
]


def _dist_cols(vec_col: str, centroids: list[list[float]]):
    """One sqrt-Euclidean distance Column per centroid (literal)."""
    v = to_double_array(vec_col)
    vnorm = dot_product(v, v)
    out = []
    for c in centroids:
        clit = F.array(*[F.lit(float(x)) for x in c])
        cn = float(sum(x * x for x in c))
        out.append(
            F.sqrt(
                F.greatest(
                    F.lit(cn) - 2.0 * dot_product(v, clit) + vnorm,
                    F.lit(0.0),
                )
            )
        )
    return out


def _assigned_ab(
    df: DataFrame, centroids: list[list[float]], vec_col: str
) -> DataFrame:
    """(cluster, a, b): own-centroid distance and nearest-OTHER-SLOT
    distance, ownership = argmin distance (first index on ties — the
    IVF/SemDeDup convention). b excludes the own slot, not the own
    VALUE: an equal-distance other centroid is a legitimate b. The
    distance array is materialized as a column first so the literal
    folds evaluate once per row, not once per reference."""
    k = len(centroids)
    tmp = df.select(
        F.array(*_dist_cols(vec_col, centroids)).alias("_d")
    )
    own = (
        F.expr("array_position(_d, array_min(_d))").cast("int")
        - F.lit(1)
    )
    # array_min skips NULLs in both engines, so masking the own slot
    # with NULL yields min-over-others.
    others = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.when(i != own, F.element_at("_d", i + 1)),
        )
    )
    return tmp.select(
        own.alias("cluster"),
        F.array_min("_d").alias("a"),
        others.alias("b"),
    )


def simplified_silhouette(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """``(cluster, n, mean_silhouette)`` per non-empty cluster,
    ``s = (b − a)/max(a, b)`` (0 when both distances are 0),
    rounded 6."""
    ab = _assigned_ab(df, centroids, vec_col)
    s = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    return (
        ab.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), 6).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )


def davies_bouldin(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """``(cluster, n, scatter, r)`` per non-empty cluster — S_i, and
    ``R_i = max_{j≠i}(S_i+S_j)/M_ij`` over non-empty j (NULL when no
    other non-empty cluster exists); avg(r) is the DB index.
    Rounded 6."""
    ab = _assigned_ab(df, centroids, vec_col)
    scat = ab.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("a").alias("s"),
    )
    # |k|² centroid distance table as literals
    spark = df.sparkSession
    rows = []
    for i, ci in enumerate(centroids):
        for j, cj in enumerate(centroids):
            if i == j:
                continue
            m = sum((x - y) ** 2 for x, y in zip(ci, cj)) ** 0.5
            rows.append((i, j, float(m)))
    mdf = spark.createDataFrame(rows, "i int, j int, m double")
    si = scat.select(
        F.col("cluster").alias("i"),
        F.col("n"),
        F.col("s").alias("si"),
    )
    sj = scat.select(
        F.col("cluster").alias("j"), F.col("s").alias("sj")
    )
    r = (
        si.join(F.broadcast(mdf), "i")
        .join(sj, "j", "left")  # empty j → NULL term → NULL max
        .groupBy("i", "n", "si")
        .agg(
            F.max(
                (F.col("si") + F.col("sj")) / F.col("m")
            ).alias("r")
        )
    )
    return r.select(
        F.col("i").alias("cluster"),
        "n",
        F.round("si", 6).alias("scatter"),
        F.round("r", 6).alias("r"),
    ).orderBy("cluster")


def _dist_sql(c: list[float]) -> str:
    lits = ", ".join(repr(float(x)) for x in c)
    cn = repr(float(sum(x * x for x in c)))
    return (
        f"sqrt(greatest({cn} - 2.0 * list_dot_product(v, [{lits}])"
        " + list_dot_product(v, v), 0.0))"
    )


def _ab_sql(
    table: str, vec_col: str, centroids: list[list[float]]
) -> str:
    dist_list = ", ".join(_dist_sql(c) for c in centroids)
    k = len(centroids)
    return f"""
    vecs AS (
        SELECT list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ), dists AS (
        SELECT [{dist_list}] AS d FROM vecs
    ), ab AS (
        SELECT CAST(list_position(d, list_min(d)) AS INT) - 1
                   AS cluster,
               list_min(d) AS a,
               list_min(list_transform(
                   range(1, {k} + 1),
                   i -> CASE WHEN i <> list_position(d, list_min(d))
                             THEN d[i] END)) AS b
        FROM dists
    )"""


def silhouette_oracle_sql(
    table: str,
    vec_col: str,
    centroids: list[list[float]],
) -> str:
    """DuckDB twin — identical literal distances and s algebra."""
    return f"""
    WITH {_ab_sql(table, vec_col, centroids)}
    SELECT cluster, count(*) AS n,
           round(avg(CASE WHEN greatest(a, b) > 0
                          THEN (b - a) / greatest(a, b)
                          ELSE 0.0 END), 6) AS mean_silhouette
    FROM ab GROUP BY cluster ORDER BY cluster
    """


def davies_bouldin_oracle_sql(
    table: str,
    vec_col: str,
    centroids: list[list[float]],
) -> str:
    """DuckDB twin — scatters from the same ab CTE, centroid-distance
    literals computed host-side exactly as the Spark builder does."""
    rows = []
    for i, ci in enumerate(centroids):
        for j, cj in enumerate(centroids):
            if i == j:
                continue
            m = sum((x - y) ** 2 for x, y in zip(ci, cj)) ** 0.5
            rows.append(f"({i}, {j}, {float(m)!r})")
    mvals = ", ".join(rows)
    return f"""
    WITH {_ab_sql(table, vec_col, centroids)},
    scat AS (
        SELECT cluster, count(*) AS n, avg(a) AS s
        FROM ab GROUP BY cluster
    ), m(i, j, m) AS (VALUES {mvals})
    SELECT si.cluster, any_value(si.n) AS n,
           round(any_value(si.s), 6) AS scatter,
           round(max((si.s + sj.s) / m.m), 6) AS r
    FROM scat si
    JOIN m ON m.i = si.cluster
    LEFT JOIN scat sj ON sj.cluster = m.j
    GROUP BY si.cluster ORDER BY si.cluster
    """
