"""Cohen's kappa (operators/agreement)."""

import pytest

from computer_vision_foundations_spark.operators.agreement import (
    cohens_kappa,
)


def test_kappa_matches_textbook_example(spark):
    # classic 2x2: a=yes/no rater A, b rater B
    # counts: yes/yes 20, yes/no 5, no/yes 10, no/no 15
    rows = (
        [("y", "y")] * 20
        + [("y", "n")] * 5
        + [("n", "y")] * 10
        + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    kappa = (po - pe) / (1 - pe)
    assert r["po"] == pytest.approx(po, abs=1e-6)
    assert r["pe"] == pytest.approx(pe, abs=1e-6)
    assert r["kappa"] == pytest.approx(kappa, abs=1e-6)


def test_perfect_agreement_is_one(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0


def test_disjoint_label_sets_survive_full_join(spark):
    # rater B uses a label A never does; marginal product is 0 there
    df = spark.createDataFrame(
        [("x", "x"), ("x", "q")], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n_labels"] == 2  # labels x and q
    assert r["po"] == 0.5
    # pe = p_a(x)*p_b(x) + p_a(q)*p_b(q) = 1*0.5 + 0*0.5 = 0.5
    assert r["pe"] == pytest.approx(0.5)
    assert r["kappa"] == pytest.approx(0.0)
