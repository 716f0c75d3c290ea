"""Chance-corrected inter-rater agreement (Cohen's kappa).

Label pipelines need more than raw accuracy between two labelers (a
model vs. ground truth, two annotators, a heuristic vs. a classifier):
when one class dominates, raw agreement is inflated by chance. Cohen's
kappa (1960) corrects it:

    κ = (p_o − p_e) / (1 − p_e)

with ``p_o`` the observed agreement and ``p_e = Σ_c p_a(c)·p_b(c)``
the agreement two independent raters with the same marginals would
reach by luck. κ=1 is perfect, 0 is chance-level, <0 is worse than
chance — the number a label-noise audit (operators/negatives.py,
z42) reports next to its disagreement list.

Spark-first shape: three aggregates over a two-column projection —
the global (n, diagonal) pair, and one marginal per rater — joined on
the label (both marginals are |classes|-sized, broadcast); the final
row is scalar algebra via the sanctioned 1-row crossJoin idiom. One
shuffle of two columns, total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohens_kappa", "kappa_algebra_sql"]


def cohens_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row ``(n, n_labels, po, pe, kappa)`` — observed agreement,
    chance agreement, Cohen's kappa (floats rounded to 6)."""
    base = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("a") == F.col("b"), 1).otherwise(0)
        ).alias("n_agree"),
    )
    ma = base.groupBy(F.col("a").alias("lab")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    mb = base.groupBy(F.col("b").alias("lab")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    chance = (
        ma.join(mb, "lab", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("ca"), F.lit(0)).cast("double")
                * F.coalesce(F.col("cb"), F.lit(0)).cast("double")
            ).alias("prod_sum"),
            F.count(F.lit(1)).alias("n_labels"),
        )
    )
    po = F.col("n_agree") / F.col("n")
    pe = F.col("prod_sum") / (F.col("n").cast("double") * F.col("n"))
    return totals.crossJoin(F.broadcast(chance)).select(
        "n",
        "n_labels",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


def kappa_algebra_sql(labeled: str) -> str:
    """SQL suffix computing kappa from a CTE/subquery named by
    ``labeled`` that exposes columns ``a`` and ``b`` (the two raters).
    Compose as ``WITH labeled AS (...) {kappa_algebra_sql('labeled')}``.
    """
    return f"""
    , totals AS (
        SELECT count(*) AS n,
               sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
        FROM {labeled}
    ), ma AS (
        SELECT a AS lab, count(*) AS ca FROM {labeled} GROUP BY 1
    ), mb AS (
        SELECT b AS lab, count(*) AS cb FROM {labeled} GROUP BY 1
    ), chance AS (
        SELECT sum(CAST(COALESCE(ca, 0) AS DOUBLE)
                   * CAST(COALESCE(cb, 0) AS DOUBLE)) AS prod_sum,
               count(*) AS n_labels
        FROM ma FULL JOIN mb USING (lab)
    )
    SELECT n, n_labels,
           round(n_agree / CAST(n AS DOUBLE), 6) AS po,
           round(prod_sum / (CAST(n AS DOUBLE) * n), 6) AS pe,
           round((n_agree / CAST(n AS DOUBLE)
                  - prod_sum / (CAST(n AS DOUBLE) * n))
                 / (1.0 - prod_sum / (CAST(n AS DOUBLE) * n)),
                 6) AS kappa
    FROM totals CROSS JOIN chance
    """
