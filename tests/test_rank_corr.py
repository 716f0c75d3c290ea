"""Spearman rank correlation (operators/rank_corr)."""

import pytest

from computer_vision_foundations_spark.operators.rank_corr import (
    spearman_by_group,
)


def test_perfect_monotone_is_one(spark):
    rows = [("a", float(i), float(i * i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "event_type string, ts double, value double")
    r = spearman_by_group(df, "ts", "value").collect()[0]
    assert r["n"] == 7
    assert r["rho"] == pytest.approx(1.0)


def test_reversed_is_minus_one(spark):
    rows = [("a", float(i), float(-i)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts double, value double")
    assert spearman_by_group(df, "ts", "value").collect()[0][
        "rho"
    ] == pytest.approx(-1.0)


def test_ties_use_average_ranks(spark):
    # y has a tie: scipy.stats.spearmanr([1,2,3,4],[1,2,2,4]) = 0.9486832980505138
    rows = [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 2.0), ("a", 4.0, 4.0)]
    df = spark.createDataFrame(rows, "event_type string, ts double, value double")
    assert spearman_by_group(df, "ts", "value").collect()[0][
        "rho"
    ] == pytest.approx(0.948683, abs=1e-6)


def test_groups_independent_and_constant_is_null(spark):
    rows = [("up", float(i), float(i)) for i in range(4)] + [
        ("flat", float(i), 5.0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts double, value double")
    got = {r["key"]: r["rho"] for r in spearman_by_group(df, "ts", "value").collect()}
    assert got["up"] == pytest.approx(1.0)
    assert got["flat"] is None  # zero variance in ranks
