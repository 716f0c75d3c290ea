"""Classifier evaluation: confusion counts, per-class F1, ROC-AUC.

Closes the evaluation loop for the classifier family the way
`operators/evaluation.py` does for ANN (recall@k), `ir_eval.py` for
ranking (nDCG) and `embedding_stats.py` for representations: once a
corpus filter IS a classifier (`operators/nbayes.py`, quality gates),
its keep/drop behavior needs the standard metrics — per-class
precision/recall/F1 for the multi-class case, threshold-free ROC-AUC
for scores.

Spark-first shapes:
- confusion/F1: ONE hash aggregate over (actual, predicted) pairs —
  |classes|² rows — then per-class margins via two re-aggregations of
  that tiny table. Corpus shuffles once, as key pairs.
- AUC by the Mann-Whitney rank-sum identity,
  ``AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻)``, computed over the SCORE
  HISTOGRAM: group scores (already rounded by the producer) into
  (score, n_pos, n_neg) rows, sort that model-sized table once, and
  fold a cumulative-negatives pass. The corpus contributes one hash
  aggregate; the single-partition window runs over distinct scores,
  not rows — the same "model-sized driver state" budget every other
  evaluation operator keeps (document: distinct scores ≤ 10^d for
  d rounded digits, independent of corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.qnorm import (
    global_cumulative_sums,
)

__all__ = [
    "classification_report",
    "auc_score",
    "auc_oracle_sql",
    "calibration_bins",
]


def classification_report(
    df: DataFrame,
    actual_col: str = "actual",
    predicted_col: str = "predicted",
) -> DataFrame:
    """Per-class ``(cls, support, tp, fp, fn, precision, recall, f1)``
    plus a ``__macro__`` row carrying unweighted means (macro-P/R/F1;
    support/tp/fp/fn summed). Rates rounded to 6. Classes never
    predicted get precision 0 by convention (0/0 → 0), mirroring
    sklearn's ``zero_division=0``."""
    pairs = df.groupBy(
        F.col(actual_col).alias("actual"),
        F.col(predicted_col).alias("predicted"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tp = (
        pairs.where(F.col("actual") == F.col("predicted"))
        .select(F.col("actual").alias("cls"), F.col("n").alias("tp"))
    )
    actual_tot = pairs.groupBy(F.col("actual").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    pred_tot = pairs.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").alias("pred_n")
    )
    per = (
        actual_tot.join(pred_tot, "cls", "full")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("support"), F.lit(0)).alias("support"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            (
                F.coalesce(F.col("pred_n"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fp"),
            (
                F.coalesce(F.col("support"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"),
    ).otherwise(F.lit(0.0))
    per = per.select(
        "cls",
        "support",
        "tp",
        "fp",
        "fn",
        prec.alias("_p"),
        rec.alias("_r"),
    ).select(
        "cls",
        "support",
        "tp",
        "fp",
        "fn",
        F.round("_p", 6).alias("precision"),
        F.round("_r", 6).alias("recall"),
        F.round(
            F.when(
                F.col("_p") + F.col("_r") > 0,
                2 * F.col("_p") * F.col("_r")
                / (F.col("_p") + F.col("_r")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("f1"),
    )
    macro = per.agg(
        F.lit("__macro__").alias("cls"),
        F.sum("support").alias("support"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("f1"), 6).alias("f1"),
    )
    return per.unionByName(macro).orderBy("cls")


def auc_score(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """One row ``(n_pos, n_neg, auc)`` — ROC-AUC via the rank-sum
    identity over the (score, n_pos, n_neg) histogram; ties get the
    conventional ½ credit. ``label_col`` is boolean.

    The "negatives strictly below" cumulative routes through
    ``qnorm.global_cumulative_sums``: the histogram has one row per
    DISTINCT score, which for a continuous (unrounded) score column
    is ≈ |rows| — a naive global ``Window.orderBy`` would funnel the
    whole table through one task (round-8 verdict #3). Integer
    counts keep the two-phase sum exact."""
    hist = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("nn"),
    )
    # inclusive cumulative, then subtract own nn → strictly-below
    cum = global_cumulative_sums(hist, ["s"], ["nn"])
    contrib = cum.select(
        "np",
        "nn",
        (
            F.col("np")
            * (
                (F.col("nn_cum") - F.col("nn"))
                + F.col("nn") / F.lit(2.0)
            )
        ).alias("u"),
    )
    return contrib.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.round(
            F.sum("u") / (F.sum("np") * F.sum("nn")).cast("double"), 6
        ).alias("auc"),
    )


def auc_oracle_sql(scored_sql: str, label: str = "label", score: str = "score") -> str:
    """DuckDB twin over any SELECT producing (label, score)."""
    return f"""
    WITH scored AS MATERIALIZED ({scored_sql}),
    hist AS (
        SELECT {score} AS s,
               sum(CASE WHEN {label} THEN 1 ELSE 0 END) AS np,
               sum(CASE WHEN {label} THEN 0 ELSE 1 END) AS nn
        FROM scored GROUP BY 1
    ), c AS (
        SELECT np, nn,
               np * (COALESCE(sum(nn) OVER (
                         ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + nn / 2.0) AS u
        FROM hist
    )
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           round(sum(u) / CAST(sum(np) * sum(nn) AS DOUBLE), 6) AS auc
    FROM c
    """


def calibration_bins(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    bin_width: float = 1.0,
) -> DataFrame:
    """Reliability-diagram table ``(bin, bin_lo, n, n_pos,
    frac_pos)``: scores bucketed into fixed-width bins
    (``bin = floor(score / bin_width)``), each with its positive
    rate. Fixed-width bins, not quantiles, by design: quantile
    binning needs a global rank of the corpus, fixed-width is ONE
    hash aggregate with map-side combine and the bin boundaries are
    plan literals — the deterministic, shuffle-light shape (the
    drift/histogram operators' convention). ``frac_pos`` rounded 6.
    """
    b = F.floor(F.col(score_col) / F.lit(float(bin_width))).cast("long")
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias(
                "n_pos"
            ),
        )
        .select(
            "bin",
            F.round(F.col("bin") * F.lit(float(bin_width)), 6).alias(
                "bin_lo"
            ),
            "n",
            "n_pos",
            F.round(
                F.col("n_pos") / F.col("n").cast("double"), 6
            ).alias("frac_pos"),
        )
        .orderBy("bin")
    )
