"""Embedding-space health diagnostics: per-class compactness.

Before training on a labeled embedding corpus (and after every
re-embedding), the standard sanity report is per-class geometry:
centroid norm and mean member-to-centroid cosine. Compact, separated
classes (high intra-class cosine) predict linear-probe accuracy;
collapsing or diffuse classes flag embedding drift, label noise or a
broken encoder — the aggregate companion to the per-point audit in
``operators/negatives.py:label_noise_scores``.

Everything is relational explode-arithmetic (no UDF): element rows
``(id, label, i, x)`` aggregate to per-(label, i) centroid components,
join back for per-member dot products, reduce to per-class scalars.
The DuckDB oracle replays the identical expression shapes; double
summation is engine-order-dependent but the q16/q09 precedent shows
round-4/6 comparison holds at all tested scales.

Scale shape: two keyed shuffles of NARROW rows — element rows
(id, label, i, x) for the centroid aggregate, and the same stream
again for the member reduction joined against the broadcast
(|labels|·dim)-row centroid table. Vectors never move whole; no
driver state beyond the final |labels| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["class_compactness"]


def class_compactness(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-class ``(label, n, centroid_norm, mean_cos)``: centroid =
    element-wise mean of the class's vectors, ``mean_cos`` = average
    cosine similarity between each member and its class centroid
    (rounded 6; centroid_norm rounded 6). Zero vectors contribute
    cosine 0 (guarded division)."""
    el = df.select(
        id_col,
        label_col,
        F.posexplode(vec_col).alias("i", "_xf"),
    ).select(
        id_col,
        label_col,
        "i",
        # promote BEFORE any arithmetic: float*float would round in
        # fp32 while the SQL oracle multiplies doubles
        F.col("_xf").cast("double").alias("x"),
    )
    cent = el.groupBy(label_col, "i").agg(F.avg("x").alias("c"))
    joined = el.join(F.broadcast(cent), [label_col, "i"])
    per_vec = joined.groupBy(id_col, label_col).agg(
        F.sum(F.col("x") * F.col("c")).alias("_dot"),
        F.sum(F.col("x") * F.col("x")).alias("_vv"),
        F.sum(F.col("c") * F.col("c")).alias("_cc"),
    )
    cos = F.when(
        (F.col("_vv") > 0) & (F.col("_cc") > 0),
        F.col("_dot") / (F.sqrt("_vv") * F.sqrt("_cc")),
    ).otherwise(F.lit(0.0))
    return (
        per_vec.withColumn("_cos", cos)
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            # _cc is identical across members of a class when vectors
            # share a dimension; MAX (not first) keeps the result
            # deterministic if ragged vectors ever slip in — a ragged
            # member sums fewer centroid components, so max = the
            # full-dimension value
            F.round(F.sqrt(F.max("_cc")), 6).alias("centroid_norm"),
            F.round(F.avg("_cos"), 6).alias("mean_cos"),
        )
    )
