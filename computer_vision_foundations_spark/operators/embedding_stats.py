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
summation is engine-order-dependent but the za53/za50 precedent shows
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

__all__ = ["class_compactness", "embedding_isotropy", "isotropy_oracle_sql"]


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


def embedding_isotropy(
    df: DataFrame,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Isotropy audit of an embedding column — the corpus-level
    geometry check (Ethayarajh 2019; Mu & Viswanath 2018): contextual
    embedding spaces are notoriously ANisotropic (all vectors share a
    dominant direction), which hurts cosine-based retrieval and dedup.
    One row: ``(n_vectors, avg_norm, mean_dir_norm,
    avg_pairwise_cos)`` where

    - ``avg_norm``: mean L2 norm of the raw vectors;
    - ``mean_dir_norm``: ||mean of unit vectors|| — 0 for a perfectly
      isotropic cloud, →1 as directions collapse;
    - ``avg_pairwise_cos``: mean cosine over ALL ordered pairs i≠j,
      computed WITHOUT forming pairs via the Gram identity
      ||Σu||² = Σᵢⱼ⟨uᵢ,uⱼ⟩  ⇒  avg = (||Σu||² − Σ||u||²) / (n(n−1)).

    Exactness (the za50 fixed-point discipline): components quantize to
    the 1e-6 grid (``floor(x·1e6 + 0.5)``), the squared norm is then
    an EXACT integer (order-free), the unit components re-quantize to
    the 1e-6 grid via one row-local IEEE expression, and every
    cross-row reduction is an integer/DECIMAL(38,0) sum — so the
    result is reduction-order free and bit-replayable in SQL. The
    metrics are DEFINED on the quantized grid (error ≤ 1e-6 per
    component), which is what makes them differentially testable.

    Scale shape: one narrow row-local quantize/normalize projection,
    ONE posexplode feeding a dim-keyed integer aggregate (d groups,
    map-side combinable) + one global integer aggregate. Vectors never
    shuffle whole; no pair formation anywhere."""
    dec = "decimal(38,0)"
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
    )
    norm2 = F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    # NULLIF inside the division, not just the n2 > 0 filter: codegen's
    # common-subexpression elimination can evaluate the projection
    # while testing the filter predicate, so under ANSI Spark a naked
    # /sqrt(0) on a zero vector throws before the filter removes it
    safe_n2 = F.sqrt(F.nullif(F.col("n2"), F.lit(0)).cast("double"))
    rows = (
        df.select(q.alias("q"), norm2.alias("n2"))
        .where(F.col("n2") > 0)
        .select(
            F.transform(
                F.col("q"),
                lambda v: F.floor(
                    v.cast("double") / safe_n2 * 1e6 + 0.5
                ).cast("long"),
            ).alias("qu"),
            F.floor(F.sqrt(F.col("n2").cast("double")) + 0.5)
            .cast("long")
            .alias("qnorm"),
        )
    )
    per_vec = rows.select(F.posexplode("qu").alias("i", "v"))
    dims = per_vec.groupBy("i").agg(F.sum("v").alias("s"))
    ssq = dims.agg(
        F.sum(F.col("s").cast(dec) * F.col("s").cast(dec)).alias("ssq")
    )
    glob = rows.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("qnorm").alias("norm_sum"),
        F.sum(
            F.aggregate(
                F.col("qu"),
                F.lit(0).cast(dec),
                lambda acc, v: acc + (v * v).cast(dec),
            )
        ).alias("selfsq"),
    )
    n = F.col("n_vectors").cast("double")
    return glob.join(F.broadcast(ssq)).select(
        "n_vectors",
        (
            F.round(F.col("norm_sum").cast("double") / n / 1e6, round_digits)
            + 0.0
        ).alias("avg_norm"),
        (
            F.round(
                F.sqrt(F.col("ssq").cast("double")) / n / 1e6, round_digits
            )
            + 0.0
        ).alias("mean_dir_norm"),
        (
            F.round(
                (F.col("ssq").cast("double") - F.col("selfsq").cast("double"))
                / F.nullif(n * (n - 1.0), F.lit(0.0))
                / 1e12,
                round_digits,
            )
            + 0.0
        ).alias("avg_pairwise_cos"),
    )


def isotropy_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical 1e-6 grids, identical integer algebra
    (HUGEINT stands in for DECIMAL(38,0))."""
    return f"""
    WITH x AS (
        SELECT CAST(u.i AS INTEGER) AS i,
               CAST(floor(CAST({vec_col}[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS q,
               rowid_key
        FROM (SELECT {vec_col}, row_number() OVER () AS rowid_key
              FROM {table}) t,
             unnest(range(len({vec_col}))) u(i)
    ), n2 AS (
        SELECT rowid_key, sum(q * q) AS n2 FROM x GROUP BY rowid_key
        HAVING sum(q * q) > 0
    ), qu AS (
        SELECT x.rowid_key AS rowid_key, x.i AS i,
               CAST(floor(CAST(x.q AS DOUBLE)
                          / sqrt(CAST(n2.n2 AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS v
        FROM x JOIN n2 USING (rowid_key)
    ), dims AS (
        SELECT i, sum(v) AS s FROM qu GROUP BY i
    ), ssq AS (
        SELECT sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS ssq FROM dims
    ), tot AS (
        SELECT count(*) AS n_vectors,
               sum(CAST(floor(sqrt(CAST(n2 AS DOUBLE)) + 0.5) AS BIGINT))
                   AS norm_sum
        FROM n2
    ), selfsq AS (
        SELECT sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS selfsq FROM qu
    )
    SELECT n_vectors,
           round(CAST(norm_sum AS DOUBLE) / CAST(n_vectors AS DOUBLE)
                 / 1000000.0, {round_digits}) + 0.0 AS avg_norm,
           round(sqrt(CAST(ssq AS DOUBLE)) / CAST(n_vectors AS DOUBLE)
                 / 1000000.0, {round_digits}) + 0.0 AS mean_dir_norm,
           round((CAST(ssq AS DOUBLE) - CAST(selfsq AS DOUBLE))
                 / NULLIF(CAST(n_vectors AS DOUBLE)
                          * (CAST(n_vectors AS DOUBLE) - 1.0), 0.0)
                 / 1e12, {round_digits}) + 0.0 AS avg_pairwise_cos
    FROM tot CROSS JOIN ssq CROSS JOIN selfsq
    """
