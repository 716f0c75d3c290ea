import math

import pytest

from computer_vision_foundations_spark.operators.ir_eval import ndcg_at_k


def _dfs(spark, ranked, qrels):
    r = spark.createDataFrame(ranked, "query_id int, doc_id long, rank int")
    q = spark.createDataFrame(qrels, "query_id int, doc_id long, rel int")
    return r, q


def test_perfect_ranking_scores_one(spark):
    ranked = [(0, 1, 1), (0, 2, 2), (0, 3, 3)]
    qrels = [(0, 1, 3), (0, 2, 2), (0, 3, 1)]
    r, q = _dfs(spark, ranked, qrels)
    out = ndcg_at_k(r, q, k=3).collect()[0]
    assert out["ndcg"] == pytest.approx(1.0)
    want_dcg = sum(
        (2**rel - 1) / math.log2(rank + 1)
        for rank, rel in [(1, 3), (2, 2), (3, 1)]
    )
    assert out["dcg"] == pytest.approx(round(want_dcg, 6))


def test_inverted_ranking_scores_below_one(spark):
    ranked = [(0, 3, 1), (0, 2, 2), (0, 1, 3)]
    qrels = [(0, 1, 3), (0, 2, 2), (0, 3, 1)]
    r, q = _dfs(spark, ranked, qrels)
    out = ndcg_at_k(r, q, k=3).collect()[0]
    assert 0 < out["ndcg"] < 1


def test_unjudged_docs_count_zero(spark):
    ranked = [(0, 99, 1), (0, 1, 2)]  # top hit unjudged
    qrels = [(0, 1, 2)]
    r, q = _dfs(spark, ranked, qrels)
    out = ndcg_at_k(r, q, k=10).collect()[0]
    # dcg = gain of doc 1 at rank 2; idcg = same gain at rank 1
    g = (2**2 - 1)
    assert out["dcg"] == pytest.approx(round(g / math.log2(3), 6))
    assert out["idcg"] == pytest.approx(round(g / math.log2(2), 6))


def test_no_relevant_docs_scores_zero(spark):
    ranked = [(0, 1, 1)]
    qrels = [(1, 5, 2)]  # judgments only for another query
    r, q = _dfs(spark, ranked, qrels)
    out = ndcg_at_k(r, q, k=5).collect()[0]
    assert out["ndcg"] == 0.0 and out["idcg"] == 0.0


def test_cutoff_applies_to_both_sides(spark):
    # 3 relevant docs but k=2: ideal uses only the best 2
    ranked = [(0, 1, 1), (0, 2, 2), (0, 3, 3)]
    qrels = [(0, 1, 1), (0, 2, 1), (0, 3, 1)]
    r, q = _dfs(spark, ranked, qrels)
    out = ndcg_at_k(r, q, k=2).collect()[0]
    want = sum(1 / math.log2(rk + 1) for rk in (1, 2))
    assert out["dcg"] == pytest.approx(round(want, 6))
    assert out["ndcg"] == pytest.approx(1.0)
