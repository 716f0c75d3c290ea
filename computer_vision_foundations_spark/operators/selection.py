"""Training-data selection: budgeted quality picks and curriculum order.

Two standard selection stages between corpus curation and training:

* **Token-budget selection** — every serious pretraining mix is
  specified as "the best N tokens per domain", not "all documents
  passing a threshold" (the quality-pareto selection of FineWeb /
  DataComp-LM): rank documents by a quality score within each domain,
  take them greedily until the domain's token budget is exhausted.
  The greedy prefix is a window cumulative sum — fully relational, one
  keyed shuffle, no iteration.

* **Curriculum ordering** — curriculum training consumes data
  easy→hard, but strictly sorting by difficulty destroys shuffle
  quality within a training window. The standard compromise
  (interleaved difficulty buckets) assigns each document a difficulty
  bucket and emits a total order that walks buckets round-robin
  within difficulty RANK (rank-major, bucket-minor), so any prefix of
  the order is a balanced mix of the buckets seen so far while
  average difficulty still rises over the epoch. Buckets come from
  EXPLICIT boundary values (a handful of scalars, broadcast as plan
  literals) rather than ``ntile`` — a global ntile is a
  single-partition window, the one thing a 100 TB ordering must never
  do; boundary scalars cost one narrow aggregate to derive and keep
  bucketing embarrassingly parallel.

Reference parity: the reference orders and caps its training inputs
driver-side before the train loop (`03_Model Training.py` sampling);
these operators are the distributed, deterministic formulation.

Scale shape: both are single window aggregations over narrow
(id, domain, score, tokens) projections — one hash-partition shuffle
on the domain (or bucket) key, no joins, no driver state; document
bodies never move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quality_budget_select", "curriculum_order", "keep_best_per_cluster"]


def quality_budget_select(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    token_budget: int = 10_000,
) -> DataFrame:
    """Greedy per-domain selection under a token budget: every input
    column plus ``(cum_tokens, selected)`` where documents are ranked
    best-first within their domain (quality desc, id asc as the
    deterministic tie-break) and ``selected`` marks the maximal
    prefix whose cumulative token count stays ≤ the budget.
    The first document of a domain is selected even if it alone
    exceeds the budget ONLY when it fits; oversized heads are cut like
    any other overflow (strict prefix rule, replayable in SQL)."""
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    # pass every input column through so composed pipelines (z40)
    # don't have to re-join their own lineage to recover stage columns
    return df.select(
        "*",
        cum.cast("long").alias("cum_tokens"),
        (cum <= token_budget).alias("selected"),
    )


def curriculum_order(
    df: DataFrame,
    boundaries: list[float],
    id_col: str = "doc_id",
    difficulty_col: Column | str = "difficulty",
) -> DataFrame:
    """Interleaved curriculum rank: ``(id, difficulty, bucket,
    rank_in_bucket, curriculum_rank)`` with ``bucket`` = 1 + number of
    ``boundaries`` strictly below the difficulty (1 = easiest;
    boundaries must be sorted ascending), ``rank_in_bucket`` the
    deterministic position inside the bucket (difficulty asc, id asc)
    and ``curriculum_rank = rank_in_bucket · n_buckets + bucket`` —
    a total order that cycles through all buckets once per "round",
    so early training still sees hard examples but average difficulty
    rises monotonically in expectation.

    ``boundaries`` are plan literals (derive them once with a narrow
    percentile aggregate if quartile-balanced buckets are wanted);
    the only shuffle is the B-way ``rank_in_bucket`` window — at
    extreme scale compose with the deterministic shard/order
    assignment (``operators/chunking.py``) inside each bucket."""
    n_buckets = len(boundaries) + 1
    dc = (
        F.col(difficulty_col)
        if isinstance(difficulty_col, str)
        else difficulty_col
    )
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + (dc > F.lit(b)).cast("int")
    with_b = df.select(
        id_col, dc.alias("difficulty"), bucket.alias("bucket")
    )
    in_b = Window.partitionBy("bucket").orderBy(
        F.col("difficulty").asc(), F.col(id_col).asc()
    )
    rib = F.row_number().over(in_b)
    return with_b.select(
        id_col,
        "difficulty",
        "bucket",
        rib.alias("rank_in_bucket"),
        (rib * n_buckets + F.col("bucket"))
        .cast("long")
        .alias("curriculum_rank"),
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection: for every duplicate cluster
    keep the HIGHEST-scoring member (score desc, id asc tie-break)
    instead of the smallest id the dedup operators default to — the
    curation-correct policy (drop the truncated/boilerplate copies,
    keep the cleanest one; RefinedWeb and book-dedup pipelines pick
    canonical docs by quality, not arrival order).

    ``clusters``: ``(id, cluster)`` membership (e.g. from
    ``operators/components.dedup_clusters``); ``quality``: ``(id,
    score)``. Rows absent from ``clusters`` are treated as singleton
    clusters of themselves (never dropped). Returns
    ``(id, cluster, score, keep)``.

    Scale shape: one equi-join on the id + one per-cluster window over
    member rows — the same budget as the min-id rule; quality never
    shuffles more than (id, double) rows."""
    c = clusters.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cluster")
    )
    q = quality.select(
        F.col(id_col).alias("_id"), F.col(score_col).alias("_score")
    )
    joined = q.join(c, "_id", "left").select(
        "_id",
        F.coalesce(F.col("_cluster"), F.col("_id")).alias("_cluster"),
        "_score",
    )
    w = Window.partitionBy("_cluster").orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("_id").alias(id_col),
            F.col("_cluster").alias(cluster_col),
            F.col("_score").alias(score_col),
            (F.col("_rn") == 1).alias("keep"),
        )
        .orderBy(id_col)
    )
