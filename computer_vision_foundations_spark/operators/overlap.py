"""Cross-corpus overlap estimation from KMV/theta sketches.

"How much does corpus A overlap corpus B?" is a first-class question
for training-data curation (contamination screening across sources,
crawl-snapshot redundancy, mixture design), and at 100 TB it cannot be
answered by joining raw token/shingle sets — only by sketches. This
module composes the KMV bottom-k sketch (``functions/sketches.py``)
with the THETA-SKETCH set-algebra estimators (Dasgupta et al. 2016,
the Apache DataSketches formulation):

    theta_g   = k-th smallest hash fraction of group g (1.0 if the
                sketch holds the whole set)
    theta_ab  = min(theta_a, theta_b)
    |A ∩ B|   ≈ |{shared hashes < theta_ab}| / theta_ab
    |A ∪ B|   ≈ est_a + est_b − |A ∩ B|
    J(A, B)   ≈ |A ∩ B| / |A ∪ B|

No merged re-rank is needed — intersection works directly on the
SHARED hashes below the pair's common theta, which turns the whole
pairwise stage into one hash equi-join between register tables.

Scale shape: raw values are seen exactly once (the narrow distinct
inside ``kmv_registers``); everything after operates on ≤ k rows per
group — model-sized state. The pairwise stage is a self equi-join of
register tables on the hash (never a group×group grid; pairs sharing
no sketch hash are reported as no-overlap by omission) plus one
broadcast of the |G|-row per-group stats. Nothing corpus-sized
shuffles twice, nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.sketches import (
    kmv_registers,
    kmv_theta,
)

__all__ = ["kmv_group_stats", "kmv_pairwise_overlap"]


def kmv_group_stats(
    regs: DataFrame, group_col: str, k: int
) -> DataFrame:
    """Per-group ``(group, n, theta, est)`` from a KMV register table:
    ``theta`` = k-th smallest hash fraction (1.0 when the group holds
    fewer than k distinct values — the sketch IS the set), ``est`` =
    exact n below k, else the KMV estimator (k−1)/theta."""
    agg = regs.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.max(
            F.when(F.col("pos") == k, kmv_theta(F.col("h")))
        ).alias("_tk"),
    )
    theta = F.when(F.col("n") < k, F.lit(1.0)).otherwise(F.col("_tk"))
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("_tk")
    )
    return agg.select(
        group_col, "n", theta.alias("theta"), est.alias("est")
    )


def kmv_pairwise_overlap(
    items: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise overlap estimates between every two groups that share
    at least one sketch hash: ``(group_a, group_b, n_shared,
    distinct_a, distinct_b, intersect_est, union_est, jaccard)`` with
    ``group_a < group_b``. Estimates rounded to 4, jaccard to 6
    digits; relative error ~1/sqrt(k−2) on each set size."""
    regs = kmv_registers(items, value_col, k=k, keys=[group_col])
    stats = kmv_group_stats(regs, group_col, k)

    a = regs.select(
        F.col(group_col).alias("group_a"),
        F.col("h").alias("h"),
        kmv_theta(F.col("h")).alias("_frac"),
    )
    b = regs.select(
        F.col(group_col).alias("group_b"), F.col("h").alias("h")
    )
    shared = a.join(b, "h").where(F.col("group_a") < F.col("group_b"))

    sa = F.broadcast(
        stats.select(
            F.col(group_col).alias("group_a"),
            F.col("theta").alias("_ta"),
            F.col("est").alias("_ea"),
        )
    )
    sb = F.broadcast(
        stats.select(
            F.col(group_col).alias("group_b"),
            F.col("theta").alias("_tb"),
            F.col("est").alias("_eb"),
        )
    )
    j = shared.join(sa, "group_a").join(sb, "group_b")
    tmin = F.least(F.col("_ta"), F.col("_tb"))
    agg = (
        j.where(F.col("_frac") < tmin)
        .groupBy("group_a", "group_b")
        .agg(
            F.count("*").alias("n_shared"),
            F.first("_ea").alias("_ea"),
            F.first("_eb").alias("_eb"),
            F.first(tmin).alias("_tmin"),
        )
    )
    inter = F.col("n_shared") / F.col("_tmin")
    union = F.col("_ea") + F.col("_eb") - inter
    return agg.select(
        "group_a",
        "group_b",
        "n_shared",
        F.round("_ea", 4).alias("distinct_a"),
        F.round("_eb", 4).alias("distinct_b"),
        F.round(inter, 4).alias("intersect_est"),
        F.round(union, 4).alias("union_est"),
        F.round(inter / union, 6).alias("jaccard"),
    )
