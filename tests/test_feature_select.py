"""Chi-square token relevance (operators/feature_select)."""

import pytest

from computer_vision_foundations_spark.operators.feature_select import (
    chi2_tokens,
)


def test_discriminative_token_beats_common_token(spark):
    # "hund" only in de docs, "the" everywhere
    rows = [
        (1, "the hund a", "de"),
        (2, "the hund b", "de"),
        (3, "the cat a", "en"),
        (4, "the cat b", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["token"]: r["chi2"] for r in chi2_tokens(df, top_k=10).collect()}
    # perfectly discriminative tokens: chi2 = n = 4
    assert got["hund"] == pytest.approx(4.0, abs=1e-6)
    assert got["cat"] == pytest.approx(4.0, abs=1e-6)
    # class-independent token: chi2 = 0
    assert got["the"] == pytest.approx(0.0, abs=1e-6)


def test_chi2_matches_hand_contingency(spark):
    # token "x" present in 2 of 3 "p" docs and 1 of 3 "q" docs
    rows = [
        (1, "x a", "p"),
        (2, "x b", "p"),
        (3, "c", "p"),
        (4, "x d", "q"),
        (5, "e", "q"),
        (6, "f", "q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["token"]: r for r in chi2_tokens(df, top_k=20).collect()}
    # hand chi2 for "x": n=6, n_tok=3, classes 3/3
    # exp present = 1.5 each; obs 2,1 -> (0.5^2/1.5)*2 = 1/3
    # exp absent = 1.5 each; obs 1,2 -> 1/3 ; total 2/3
    assert got["x"]["chi2"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["x"]["n_docs_with"] == 3


def test_top_k_and_tie_break(spark):
    rows = [(i, "alpha beta", "p") for i in range(3)] + [
        (10 + i, "gamma delta", "q") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = chi2_tokens(df, top_k=2).collect()
    # all four tokens tie at chi2 = 6; tie-break by token asc
    assert [r["token"] for r in got] == ["alpha", "beta"]
