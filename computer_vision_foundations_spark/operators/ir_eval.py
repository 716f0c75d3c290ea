"""Ranked-retrieval evaluation: nDCG@k.

The retrieval family (BM25 ``operators/retrieval.py``, ANN
``operators/similarity.py``) is evaluated by different yardsticks:
ANN against exact neighbors (recall@k, ``operators/evaluation.py``),
ranked text retrieval against GRADED relevance — normalized
discounted cumulative gain (Järvelin & Kekäläinen 2002):

    DCG@k  = Σ_{rank≤k} (2^rel − 1) / log2(rank + 1)
    nDCG@k = DCG@k / IDCG@k       (IDCG = DCG of the ideal ordering)

Everything is relational: one join of the ranking against the
relevance judgments (absent judgment = relevance 0), one per-query
ideal re-ranking of the judgments, two scalar aggregates. The gain
and discount use exact integer relevance and log2 of small integers,
so the DuckDB oracle replays the metric bit-for-bit at round-6.

Scale shape: rankings are top-k per query (model-sized); judgments
join on (query, doc) — one narrow hash join + one |queries|-row
aggregate. Nothing corpus-sized moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ndcg_at_k"]


def ndcg_at_k(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query ``(query, dcg, idcg, ndcg)`` at cutoff ``k``:
    ``ranked`` holds (query, doc, rank≥1), ``qrels`` graded integer
    relevance (missing pairs count as 0). Queries with an empty ideal
    gain (no relevant docs at all) report ndcg 0."""
    gain = (F.pow(F.lit(2.0), F.col(rel_col)) - 1) / F.log2(
        F.col(rank_col) + 1
    )
    hits = (
        ranked.where(F.col(rank_col) <= k)
        .join(qrels, [query_col, doc_col], "left")
        .withColumn(rel_col, F.coalesce(F.col(rel_col), F.lit(0)))
    )
    dcg = hits.groupBy(query_col).agg(
        F.sum(gain).alias("dcg")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(doc_col).asc()
    )
    ideal = (
        qrels.where(F.col(rel_col) > 0)
        .withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .groupBy(query_col)
        .agg(F.sum(gain).alias("idcg"))
    )
    out = dcg.join(ideal, query_col, "left")
    ndcg = F.when(
        F.col("idcg").isNotNull() & (F.col("idcg") > 0),
        F.col("dcg") / F.col("idcg"),
    ).otherwise(F.lit(0.0))
    return out.select(
        query_col,
        F.round("dcg", 6).alias("dcg"),
        F.round(F.coalesce("idcg", F.lit(0.0)), 6).alias("idcg"),
        F.round(ndcg, 6).alias("ndcg"),
    )
