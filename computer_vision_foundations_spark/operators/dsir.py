"""DSIR-style importance weights for data selection.

Data Selection via Importance Resampling (Xie et al. 2023) scores
every raw-corpus document by how much more likely its text is under a
TARGET distribution (curated/high-quality corpus) than under the RAW
distribution, then resamples proportionally. With unigram (hashed
n-gram in the paper) features the weight is a pure relational object:

    w(doc) = (1/|doc|) Σ_t  log2 p_target(t) − log2 p_raw(t)

Laplace-smoothed on both sides (pseudo-count ``alpha`` over the UNION
vocabulary) so tokens absent from either corpus stay finite.

Spark-first shape: two |vocab|-row hash aggregates (target + raw
frequency models), a full-outer model join to materialize the shared
vocabulary once, then ONE hash join from the (id, token) stream to the
|vocab|-row ratio table and a per-document average — the TF-IDF
shuffle budget, nothing document-sized ever broadcast. Compose with
``operators/sample.weighted_sample_k`` (seeded A-ES) for the actual
resampling step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.text import tokens

__all__ = ["dsir_logratio_weights"]


def dsir_logratio_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out_col: str = "dsir_weight",
) -> DataFrame:
    """``(id, n_tokens, dsir_weight)`` for every raw document.

    ``dsir_weight`` is the mean per-token log2 likelihood ratio of the
    target unigram model over the raw unigram model, both Laplace
    smoothed with pseudo-count ``alpha`` over the union vocabulary:

        p_c(t) = (cnt_c(t) + alpha) / (N_c + alpha * |V|)

    Positive = looks more like the target corpus. Deterministic, so a
    SQL oracle replays it; seeded resampling on the weight column is
    ``weighted_sample_k``'s job.
    """
    raw_freq = (
        raw.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("raw_cnt"))
    )
    tgt_freq = (
        target.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tgt_cnt"))
    )
    vocab = raw_freq.join(tgt_freq, "token", "full_outer").select(
        "token",
        F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
        F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
    )
    consts = vocab.agg(
        F.sum("raw_cnt").cast("double").alias("_raw_n"),
        F.sum("tgt_cnt").cast("double").alias("_tgt_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    a = F.lit(float(alpha))
    ratio = (
        vocab.crossJoin(F.broadcast(consts))
        .select(
            "token",
            (
                F.log2(
                    (F.col("tgt_cnt") + a)
                    / (F.col("_tgt_n") + a * F.col("_v"))
                )
                - F.log2(
                    (F.col("raw_cnt") + a)
                    / (F.col("_raw_n") + a * F.col("_v"))
                )
            ).alias("logratio"),
        )
    )
    toks = raw.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return (
        toks.join(ratio, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logratio").alias(out_col),
        )
    )
