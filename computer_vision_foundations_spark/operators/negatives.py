"""Contrastive-training data mining: hard negatives and label noise.

Two embedding-space curation ops every retrieval/contrastive training
pipeline runs over its vector corpus:

* **Hard-negative mining** (DPR, Karpukhin et al. 2020; ANCE) — for
  each anchor, the most SIMILAR vectors with a DIFFERENT label are the
  negatives that actually teach the model; random negatives are too
  easy. Exact top-k over the label-mismatch pairs, probe-set shaped:
  anchors are broadcast against the corpus exactly like
  ``similarity.brute_force_knn`` (whose join shape and tie discipline
  this reuses), plus the label-inequality pair filter.

* **Label-noise scoring** (deep k-NN auditing, Papernot & McDaniel
  2018 / Northcutt's confident-learning shape) — a point far from its
  OWN class in embedding space is a suspect mislabel. Score = cosine
  similarity to the k-th nearest SAME-label neighbor (the weakest
  available neighbor when the class is smaller than k); low scores
  flag candidates for relabeling. Built on the blocked self-kNN join,
  so pairs form only within classes — Σ|class|², never n².

* **Deterministic random negatives** (:func:`negative_samples`) —
  the RANDOM-negative complement of hard mining: k hash-drawn
  negatives per (anchor, positive) pair over a dense id space,
  ``md5(a|p|j|seed) mod N`` — a pure function of the pair, so every
  epoch/engine/partitioning regenerates identical negatives with no
  RNG state and no second corpus pass (the q68 partition-dependence
  lesson applied to pair mining); collision slots are dropped, not
  redrawn (expected loss 2k/N).

Scale shape: hard negatives broadcast the (small) anchor set — one
pruned corpus scan, one per-anchor top-k; label-noise scoring is the
blocked self-join plus one per-point aggregate; random negatives are
one narrow k-explode projection + a 1-row count broadcast. Raw
vectors shuffle only inside their class block; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.vectors import (
    cosine_from_norms,
    l2_norm,
)
from computer_vision_foundations_spark.operators.similarity import (
    knn_join_blocked,
)

__all__ = [
    "hard_negative_mining",
    "label_noise_scores",
    "negative_samples",
    "negative_samples_oracle_sql",
]


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """``(anchor_id, negative_id, cos_sim, rank)`` — the ``k`` most
    cosine-similar corpus rows whose label DIFFERS from the anchor's.
    Ties break on negative_id after rounding (total-order
    deterministic for the differential oracle)."""
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_al"),
        F.col(vec_col).alias("_av"),
        l2_norm(vec_col).alias("_an"),
    )
    c = corpus.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("_cl"),
        F.col(vec_col).alias("_cv"),
        l2_norm(vec_col).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("_al") != F.col("_cl"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_from_norms("_av", "_cv", "_an", "_cn"),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "cos_sim", "rank")
    )


def label_noise_scores(
    df: DataFrame,
    k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """``(id, label, kth_sim, n_neighbors, suspect)`` — cosine
    similarity to the k-th nearest SAME-label neighbor (the weakest
    available one when the class holds fewer than k+1 members);
    ``suspect`` marks points with ``kth_sim < threshold``. Singleton
    classes produce no row (no same-label neighbor exists to judge
    by)."""
    nn = knn_join_blocked(
        df,
        k=k,
        block_col=label_col,
        vec_col=vec_col,
        id_col=id_col,
        round_digits=round_digits,
    )
    agg = nn.groupBy("qid").agg(
        F.max("rank").alias("n_neighbors"),
        F.min("cos_sim").alias("_weakest"),
    )
    # rank is dense 1..min(k, class-1); the k-th (or weakest) sim is
    # the MIN cos_sim among the kept top-k rows
    labels = df.select(
        F.col(id_col).alias("qid"), F.col(label_col).alias("label")
    )
    return (
        agg.join(labels, "qid")
        .select(
            F.col("qid").alias(id_col),
            "label",
            F.col("_weakest").alias("kth_sim"),
            F.col("n_neighbors").cast("long").alias("n_neighbors"),
            (F.col("_weakest") < threshold).alias("suspect"),
        )
    )


def negative_samples(
    pairs: DataFrame,
    corpus: DataFrame,
    anchor_col: str,
    pos_col: str,
    corpus_id_col: str,
    k: int = 4,
    seed: int = 13,
) -> DataFrame:
    """``(anchor, pos, j, neg)`` — up to ``k`` hash-drawn negatives
    per input pair over the DENSE id space ``[0, |corpus|)``.

    Requires dense contiguous corpus ids (0..N−1 — standard for
    training manifests; build a dense rank first otherwise). Slots
    whose draw collides with the pair's own anchor/positive are
    DROPPED, not redrawn (keeps the draw a pure function of
    (a, p, j, seed); expected loss 2k/N)."""
    n_row = corpus.agg(
        F.count(F.col(corpus_id_col)).alias("_n")
    )
    a = F.col(anchor_col).cast("long")
    p = F.col(pos_col).cast("long")
    base = pairs.select(
        a.alias("anchor"), p.alias("pos")
    ).join(F.broadcast(n_row))
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    withj = base.select("anchor", "pos", "_n", j)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("anchor"),
                    F.col("pos"),
                    F.col("j"),
                    F.lit(str(seed)),
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    neg = (h % F.col("_n")).alias("neg")
    return (
        withj.select("anchor", "pos", "j", neg)
        .where((F.col("neg") != F.col("anchor")) & (F.col("neg") != F.col("pos")))
    )


def negative_samples_oracle_sql(
    pairs_sql: str,
    corpus_sql: str,
    k: int = 4,
    seed: int = 13,
) -> str:
    """DuckDB twin over sources yielding ``(anchor, pos)`` and a
    corpus with one id column named ``id``."""
    return f"""
    WITH n AS (
        SELECT count(id) AS _n FROM ({corpus_sql})
    ), withj AS (
        SELECT anchor, pos, _n, u.j AS j
        FROM ({pairs_sql}) CROSS JOIN n,
             unnest(range({k})) u(j)
    )
    SELECT anchor, pos, CAST(j AS INT) AS j,
           CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || '|'
                                   || CAST(pos AS VARCHAR) || '|'
                                   || CAST(j AS VARCHAR) || '|{seed}'),
                                1, 13)) AS BIGINT) % _n AS neg
    FROM withj
    WHERE CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || '|'
                                || CAST(pos AS VARCHAR) || '|'
                                || CAST(j AS VARCHAR) || '|{seed}'),
                             1, 13)) AS BIGINT) % _n NOT IN (anchor, pos)
    """
