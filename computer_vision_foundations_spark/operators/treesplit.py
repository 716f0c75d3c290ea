"""Histogram-based decision-stump split finding — the XGBoost /
LightGBM tree-growing primitive re-expressed as a pure DataFrame
aggregation.

Distributed gradient-boosted trees never sort the raw data per
feature: they bin each feature, build per-(feature, bin) label
histograms in ONE data pass (a map-side-combinable groupBy), and then
scan the tiny histogram for the impurity-minimizing threshold. That
split search — cumulative left/right class counts, weighted Gini —
touches only bins-sized state, so a 100 TB fact table costs exactly
one hash aggregation regardless of how many candidate thresholds are
evaluated.

Determinism contract (the za50 pca lesson): every cumulative quantity is an
INTEGER (counts), so no float reduction order exists anywhere; the
Gini score is a per-row scalar expression over those integers, written
with the identical operation tree in the Spark plan and the DuckDB
oracle (IEEE ops on identical inputs are bit-equal), and ordering ties
break on the bin id after rounding.

Reference parity: the reference trains its classifier on driver-side
tensors (03a_Model Training.py); distributed split finding is the
engine-side counterpart a 100 TB tabular corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["histogram_best_splits", "best_splits_oracle_sql"]


def histogram_best_splits(
    df: DataFrame,
    features: dict[str, Column],
    label: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Best binary split per feature by weighted Gini impurity.

    ``features`` maps feature name → integer bin expression; ``label``
    is a 0/1 expression. Returns one row per feature:
    ``(feature, split_bin, score, n_left, pos_left, n_right,
    pos_right)`` where the split sends ``bin <= split_bin`` left and
    ``score`` is the impurity after the split (lower is better; ties
    break on the smaller bin).

    Scale shape: one explode (|features|× fan-out of 2 int columns),
    one map-side-combinable groupBy down to |features|·|bins| rows,
    then windows over that histogram only.
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        expr.cast("int").alias("bin"),
                    )
                    for name, expr in features.items()
                ]
            )
        ).alias("fb"),
        label.cast("int").alias("y"),
    ).select("fb.feature", "fb.bin", "y")

    hist = melted.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "bin",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("pos").over(w_cum).alias("pl"),
        F.sum("n").over(w_tot).alias("nt"),
        F.sum("pos").over(w_tot).alias("pt"),
    ).filter(F.col("nl") < F.col("nt"))

    nl = F.col("nl").cast("double")
    pl = F.col("pl").cast("double")
    nr = (F.col("nt") - F.col("nl")).cast("double")
    pr = (F.col("pt") - F.col("pl")).cast("double")
    # identical operation tree in best_splits_oracle_sql — do not
    # refactor one side without the other
    gini_l = F.lit(1.0) - (pl * pl + (nl - pl) * (nl - pl)) / (nl * nl)
    gini_r = F.lit(1.0) - (pr * pr + (nr - pr) * (nr - pr)) / (nr * nr)
    score = (nl * gini_l + nr * gini_r) / F.col("nt").cast("double")

    scored = cum.select(
        "feature",
        F.col("bin").alias("split_bin"),
        F.round(score, round_digits).alias("score"),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        (F.col("nt") - F.col("nl")).alias("n_right"),
        (F.col("pt") - F.col("pl")).alias("pos_right"),
    )
    w_best = Window.partitionBy("feature").orderBy("score", "split_bin")
    return (
        scored.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def best_splits_oracle_sql(
    melted_sql: str, round_digits: int = 6
) -> str:
    """DuckDB twin over ``melted_sql`` yielding ``(feature, bin, y)``
    — same histogram, same cumulative integers, same Gini expression
    tree, same tie-break."""
    return f"""
    WITH melted AS ({melted_sql}),
    hist AS (
        SELECT feature, bin, count(*) AS n, sum(y) AS pos
        FROM melted GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, bin,
               CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
               CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
               CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
               CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS pt
        FROM hist
    ),
    scored AS (
        SELECT feature, bin AS split_bin,
               round((CAST(nl AS DOUBLE) *
                      (1.0 - (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
                              + (CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE))
                                * (CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE)))
                             / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)))
                      + CAST(nt - nl AS DOUBLE) *
                      (1.0 - (CAST(pt - pl AS DOUBLE) * CAST(pt - pl AS DOUBLE)
                              + (CAST(nt - nl AS DOUBLE) - CAST(pt - pl AS DOUBLE))
                                * (CAST(nt - nl AS DOUBLE) - CAST(pt - pl AS DOUBLE)))
                             / (CAST(nt - nl AS DOUBLE) * CAST(nt - nl AS DOUBLE))))
                     / CAST(nt AS DOUBLE), {round_digits}) AS score,
               nl AS n_left, pl AS pos_left,
               nt - nl AS n_right, pt - pl AS pos_right
        FROM cum WHERE nl < nt
    )
    SELECT feature, split_bin, score, n_left, pos_left, n_right, pos_right
    FROM (SELECT *, row_number() OVER (PARTITION BY feature
                                       ORDER BY score, split_bin) AS rn
          FROM scored) t
    WHERE rn = 1
    """
