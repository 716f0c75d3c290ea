"""Classifier evaluation metrics (operators/cls_eval)."""

import pytest

from computer_vision_foundations_spark.operators.cls_eval import (
    auc_score,
    classification_report,
)


def test_classification_report_matches_sklearn_arithmetic(spark):
    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "a"),
        ("c", "a"),  # class c never predicted
    ]
    df = spark.createDataFrame(rows, "actual string, predicted string")
    out = {
        r["cls"]: r
        for r in classification_report(df, "actual", "predicted").collect()
    }
    a, b, c, m = out["a"], out["b"], out["c"], out["__macro__"]
    # a: tp=2 fp=2 fn=1 -> p=.5 r=2/3
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (3, 2, 2, 1)
    assert a["precision"] == 0.5
    assert a["recall"] == pytest.approx(2 / 3, abs=1e-6)
    # b: tp=1 fp=1 fn=1 -> p=r=f1=.5
    assert (b["precision"], b["recall"], b["f1"]) == (0.5, 0.5, 0.5)
    # c: never predicted -> all zero (zero_division=0 convention)
    assert (c["support"], c["tp"], c["precision"], c["recall"], c["f1"]) == (
        1, 0, 0.0, 0.0, 0.0,
    )
    # macro: unweighted means of the rounded per-class rates
    assert m["support"] == 6
    assert m["precision"] == pytest.approx(
        round((0.5 + 0.5 + 0.0) / 3, 6)
    )


def test_auc_perfect_and_reversed(spark):
    df = spark.createDataFrame(
        [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)],
        "label boolean, score double",
    )
    assert auc_score(df).collect()[0]["auc"] == 1.0
    flipped = spark.createDataFrame(
        [(False, 0.9), (False, 0.8), (True, 0.2), (True, 0.1)],
        "label boolean, score double",
    )
    assert auc_score(flipped).collect()[0]["auc"] == 0.0


def test_auc_ties_get_half_credit(spark):
    df = spark.createDataFrame(
        [(True, 0.5), (False, 0.5)], "label boolean, score double"
    )
    assert auc_score(df).collect()[0]["auc"] == 0.5


def test_auc_matches_sklearn_formula_on_mixed_data(spark):
    data = [
        (True, 0.9), (False, 0.9), (True, 0.7), (False, 0.6),
        (True, 0.6), (False, 0.3), (True, 0.2), (False, 0.2),
    ]
    # brute-force P(s+ > s-) + 0.5 P(=)
    pos = [s for l, s in data if l]
    neg = [s for l, s in data if not l]
    u = sum(
        1.0 if p > n else 0.5 if p == n else 0.0
        for p in pos
        for n in neg
    )
    want = round(u / (len(pos) * len(neg)), 6)
    df = spark.createDataFrame(data, "label boolean, score double")
    row = auc_score(df).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (4, 4)
    assert row["auc"] == pytest.approx(want)


def test_calibration_bins_fixed_width(spark):
    from computer_vision_foundations_spark.operators.cls_eval import (
        calibration_bins,
    )

    df = spark.createDataFrame(
        [(True, -1.0), (False, -1.5), (True, -12.0), (True, -19.9)],
        "label boolean, score double",
    )
    out = {
        r["bin"]: (r["bin_lo"], r["n"], r["n_pos"], r["frac_pos"])
        for r in calibration_bins(df, bin_width=10.0).collect()
    }
    assert out[-1] == (-10.0, 2, 1, 0.5)
    assert out[-2] == (-20.0, 2, 2, 1.0)
