"""Vocabulary stats: exact counts/coverage on a hand-built corpus;
PMI sign behavior; top-k plan uses TakeOrdered, not a global sort."""

import math

import pytest

from computer_vision_foundations_spark.operators.vocab import (
    pmi_bigrams,
    vocab_top_k,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a a a b"),
        (2, "a b c"),
        (3, "x y x y"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_counts_and_coverage(spark, corpus):
    got = {r.token: r for r in vocab_top_k(corpus, "text", k=10).collect()}
    # 11 tokens total: a=4 b=2 x=2 y=2 c=1
    assert got["a"].n == 4 and got["a"].rank == 1
    assert got["a"].cum_share == round(4 / 11, 6)
    assert got["b"].rank == 2  # count tie (b,x,y) breaks by token text
    assert got["c"].cum_share == 1.0
    top2 = vocab_top_k(corpus, "text", k=2).collect()
    assert [r.token for r in sorted(top2, key=lambda r: r.rank)] == ["a", "b"]


def test_pmi_values(spark):
    # "p q" always adjacent -> strongly positive PMI
    rows = [(i, "p q r s") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.bigram: r for r in pmi_bigrams(df, "text", min_count=5, k=10).collect()}
    # 30 bigrams total (3 per doc), 40 unigrams; p q: n_ab=10, n_p=n_q=10
    want = math.log((10 / 30) / ((10 / 40) * (10 / 40)))
    assert abs(got["p q"].pmi - round(want, 6)) < 1e-9
    assert got["p q"].n_ab == 10


def test_topk_plan_is_take_ordered(spark, corpus):
    plan = (
        vocab_top_k(corpus, "text", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
