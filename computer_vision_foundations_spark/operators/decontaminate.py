"""Benchmark decontamination: remove eval-set overlap from training data.

A first-class step in serious LLM data pipelines: before training,
every document sharing substantial n-gram overlap with an evaluation
benchmark must be dropped, or downstream eval numbers measure
memorization. The standard formulation (overlap fraction of the EVAL
document's n-grams found in the training document) is what these
operators compute.

Scale shape: the eval side is tiny compared to the corpus (benchmarks
are thousands of documents, the corpus is billions), so the eval
shingle set is BROADCAST and the corpus stream is filtered map-side by
the join — the training corpus is scanned once and never shuffled on
text. The per-(train, eval) overlap count is a hash aggregate on id
pairs. With a non-broadcastable eval side, drop ``broadcast_eval`` and
the same plan runs as a shuffled equi-join on the shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.dedup import _with_shingles

__all__ = ["contamination_pairs", "decontaminate"]


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_frac: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """``(train_id, eval_id, common, overlap_frac)`` for pairs where
    ``overlap_frac = |shared k-grams| / |eval doc's k-grams| >=
    min_frac``. ``k`` defaults to 8 (the usual decontamination n-gram
    size); shingles are distinct per document, so ``overlap_frac`` is a
    true set-containment fraction in [0, 1]."""
    t = _with_shingles(train, text_col, id_col, "train_id", k)
    e = _with_shingles(eval_df, text_col, id_col, "eval_id", k).withColumn(
        "_esize", F.size("_shingles")
    )
    te = t.select("train_id", F.explode("_shingles").alias("_shingle"))
    ee = e.select("eval_id", "_esize", F.explode("_shingles").alias("_shingle"))
    if broadcast_eval:
        ee = F.broadcast(ee)
    frac = F.col("common").cast("double") / F.col("_esize").cast("double")
    return (
        te.join(ee, "_shingle")
        .groupBy("train_id", "eval_id", "_esize")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(frac >= F.lit(float(min_frac)))
        .select(
            "train_id",
            "eval_id",
            "common",
            F.round(frac, 6).alias("overlap_frac"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_frac: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The training corpus minus every document contaminated by the
    eval set (anti-join on the flagged ids; all input columns pass
    through)."""
    flagged = (
        contamination_pairs(
            train, eval_df, text_col, id_col, k, min_frac, broadcast_eval
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")
