"""Unigram language-model scoring: the perplexity-proxy quality filter.

CCNet-style pipelines score every document with a language model and
drop the high-perplexity tail (Wenzek et al. 2020); the trainable-LM
part is out of engine scope, but the UNIGRAM version — mean token
surprisal under the corpus's own (or a reference corpus's) unigram
distribution — is a pure relational computation and a standard cheap
stand-in: boilerplate and gibberish both surface as outliers.

    score(doc) = -(1/|doc|) Σ_t log2 p(t),   p(t) = count(t) / N

Spark-first shape: ONE hash aggregate builds the frequency table
(map-side combine; rows = |vocab|), the corpus token stream joins it
on the token (shuffle carries (id, token) pairs — the same budget as
TF-IDF), and a final hash aggregate on the id averages surprisal.
The total-token count rides a broadcast 1-row crossJoin. Training
corpus and scored corpus can differ (``freq_df``): score a new crawl
against a trusted reference distribution.

OOV handling when scoring against an external frequency table:
Laplace-style floor — unseen tokens get pseudo-count ``alpha``
(default 1), i.e. p = alpha / N, so surprisal stays finite and OOV-
heavy documents rank as the outliers they are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.text import tokens

__all__ = [
    "unigram_frequencies",
    "unigram_logprob_scores",
    "bigram_frequencies",
    "bigram_logprob_scores",
    "kneser_ney_logprob_scores",
]


def unigram_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(token, cnt)`` over the corpus — the unigram "model". One
    explode + one hash aggregate with map-side partial combine."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    freq_df: DataFrame | None = None,
    alpha: float = 1.0,
    out_col: str = "surprisal",
) -> DataFrame:
    """``(id, n_tokens, surprisal)`` — mean -log2 p(token) per document.

    ``freq_df`` is a ``(token, cnt)`` table from
    :func:`unigram_frequencies` (defaults to fitting on ``df`` itself,
    the self-scored corpus form). Tokens absent from ``freq_df`` get
    pseudo-count ``alpha``."""
    # the freq table has two consumers (the total aggregate and the
    # scoring join): in the self-scored form, checkpoint the
    # |vocab|-sized model once so the corpus tokenizes once for the
    # model, not once per consumer (the bigram/KN model-table
    # discipline); an externally supplied freq_df keeps its caller's
    # caching decision
    freq = (
        freq_df
        if freq_df is not None
        else unigram_frequencies(df, text_col).localCheckpoint()
    )
    total = freq.agg(F.sum("cnt").cast("double").alias("_n_total"))
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    p = F.coalesce(F.col("cnt").cast("double"), F.lit(float(alpha))) / F.col(
        "_n_total"
    )
    return (
        toks.join(freq, "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log2(p)).alias(out_col),
        )
    )


def _positioned_tokens(
    df: DataFrame, text_col: str, id_col: str | None
) -> DataFrame:
    """(id?, pos, token, prev) — prev is NULL at pos 0. One narrow
    transform + explode; text never survives past this projection.
    ``id_col=None`` omits the identity column entirely (for model
    aggregates that need only the pairs)."""
    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    # tokenize+struct-explode is the CPU-heavy stage of every LM query;
    # widen an under-parallel (single-split) scan first — no-op at
    # scale (operators/parallelism.py)
    df = widen_if_under_parallel(df)
    toks = tokens(text_col)
    structs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.element_at(toks, i + 1).alias("token"),
            F.when(i > 0, F.element_at(toks, i)).alias("prev"),
        ),
    )
    head = [F.col(id_col)] if id_col is not None else []
    out_cols = ([id_col] if id_col is not None else []) + [
        "s.pos", "s.token", "s.prev"
    ]
    return df.select(*head, F.explode(structs).alias("s")).select(*out_cols)


def bigram_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(prev, token, cnt)`` over consecutive token pairs — the bigram
    "model". Same one-aggregate budget as the unigram table; row count
    is the number of DISTINCT bigrams, not corpus size."""
    pos = _positioned_tokens(df, text_col, None)
    return (
        pos.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    out_col: str = "surprisal",
) -> DataFrame:
    """``(id, n_tokens, surprisal)`` under an interpolated bigram LM:

        p(t | prev) = lam * cnt(prev,t)/cnt(prev,·) + (1-lam) * p_uni(t)

    with the first token of each document scored by the unigram term
    alone — the standard Jelinek-Mercer smoothing step up from
    :func:`unigram_logprob_scores` (still a pure relational pipeline,
    two model aggregates + three hash joins on the token stream; the
    interpolation keeps unseen bigrams finite without Katz backoff
    machinery). Self-scored form: the model is fit on ``df`` itself.
    """
    pos = _positioned_tokens(df, text_col, id_col)
    # ONE corpus-sized aggregate fits the whole model: grouping
    # (prev, token) WITH the NULL-prev rows (document-initial tokens)
    # makes the unigram table a derived sum over the bigram table —
    # exact integer counts, identical values — so the corpus is
    # tokenized+shuffled once for the model instead of once per
    # sub-model (uni + bi separately = 2 full passes; measured q11
    # 12.4 s → see SCALE.md). The aggregate is model-sized (|distinct
    # bigrams| rows), so the checkpoint that lets its three consumers
    # share it is cheap.
    bi_all = (
        pos.groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("bcnt"))
        .localCheckpoint()
    )
    uni = bi_all.groupBy("token").agg(F.sum("bcnt").alias("ucnt"))
    total = uni.agg(F.sum("ucnt").cast("double").alias("_n_total"))
    bi = bi_all.filter(F.col("prev").isNotNull())
    prev_tot = bi.groupBy("prev").agg(
        F.sum("bcnt").cast("double").alias("pcnt")
    )
    p_uni = F.col("ucnt").cast("double") / F.col("_n_total")
    cond = F.coalesce(F.col("bcnt").cast("double") / F.col("pcnt"), F.lit(0.0))
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(
        F.lit(float(lam)) * cond + F.lit(float(1.0 - lam)) * p_uni
    )
    return (
        pos.join(uni, "token")
        .crossJoin(F.broadcast(total))
        .join(bi, ["prev", "token"], "left")
        .join(prev_tot, "prev", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log2(p)).alias(out_col),
        )
    )


def kneser_ney_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    out_col: str = "surprisal",
) -> DataFrame:
    """``(id, n_tokens, surprisal)`` under an interpolated Kneser-Ney
    bigram LM — the smoothing the n-gram-LM literature (Chen &
    Goodman 1999; KenLM's default) settled on, and a sharper
    perplexity-proxy filter than Jelinek-Mercer because the backoff
    distribution is the CONTINUATION probability, not raw frequency:
    a token that appears millions of times after one fixed neighbor
    ("Francisco" after "San") gets a small backoff weight.

        p(t | prev) = max(c(prev,t) − D, 0) / c(prev,·)
                      + D · N1+(prev,·) / c(prev,·) · p_cont(t)
        p_cont(t)   = N1+(·,t) / N1+(·,·)

    with N1+ the distinct-continuation counts and the document's
    first token scored by the unigram MLE (p_cont can be zero for
    tokens only ever seen document-initial; the unigram never is in
    the self-scored form).

    Scale shape — identical budget to :func:`bigram_logprob_scores`:
    the model is three vocab-/bigram-sized hash aggregates (c(v,w),
    its per-prev totals + distinct-fanout, per-token continuation
    counts); scoring joins the (id, pos, prev, token) stream against
    them and hash-aggregates per document. Text never survives the
    tokenize projection; all model tables are id/count rows.
    """
    d = float(discount)
    pos = _positioned_tokens(df, text_col, id_col)
    # ONE corpus-sized aggregate fits the whole model — the identical
    # discipline bigram_logprob_scores landed (q11, 12.4 s → SCALE.md):
    # grouping (prev, token) WITH the NULL-prev rows makes the unigram
    # table a derived sum over the checkpointed bigram table, and the
    # four model aggregates below (uni, prev_stats, cont, cont_total)
    # all read the model-sized checkpoint instead of each replaying the
    # tokenize+explode pipeline (the un-checkpointed form evaluated it
    # SEVEN times per score — round-12 plan audit, z53 48 Exchanges).
    bi_all = (
        pos.groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("bcnt"))
        .localCheckpoint()
    )
    uni = bi_all.groupBy("token").agg(F.sum("bcnt").alias("ucnt"))
    total = uni.agg(F.sum("ucnt").cast("double").alias("_n_total"))
    bi = bi_all.filter(F.col("prev").isNotNull())
    # c(prev,·) and N1+(prev,·): one aggregate over the bigram table
    prev_stats = bi.groupBy("prev").agg(
        F.sum("bcnt").cast("double").alias("pcnt"),
        F.count(F.lit(1)).cast("double").alias("fanout"),
    )
    # N1+(·,token) and N1+(·,·): continuation counts
    cont = bi.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("ccnt")
    )
    cont_total = bi.agg(
        F.count(F.lit(1)).cast("double").alias("_n_bigrams")
    )
    p_uni = F.col("ucnt").cast("double") / F.col("_n_total")
    p_cont = F.coalesce(F.col("ccnt"), F.lit(0.0)) / F.col("_n_bigrams")
    disc = (
        F.greatest(
            F.coalesce(F.col("bcnt").cast("double"), F.lit(0.0))
            - F.lit(d),
            F.lit(0.0),
        )
        / F.col("pcnt")
    )
    backoff = F.lit(d) * F.col("fanout") / F.col("pcnt") * p_cont
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(disc + backoff)
    return (
        pos.join(uni, "token")
        .crossJoin(F.broadcast(total))
        .join(bi, ["prev", "token"], "left")
        .join(prev_stats, "prev", "left")
        .join(cont, "token", "left")
        .crossJoin(F.broadcast(cont_total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log2(p)).alias(out_col),
        )
    )
