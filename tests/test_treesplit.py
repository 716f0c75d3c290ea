"""Histogram split finding: known-best-split and histogram semantics."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.treesplit import (
    histogram_best_splits,
)


def _splits(spark, rows):
    df = spark.createDataFrame(rows, ["v", "y"])
    out = histogram_best_splits(
        df, {"v": F.col("v")}, F.col("y") == 1
    ).collect()
    assert len(out) == 1
    return out[0]


def test_perfect_separation_found(spark):
    # y=0 for bins 1..5, y=1 for bins 6..10 → splitting at 5 yields
    # pure children (weighted Gini 0)
    rows = [(b, 0) for b in range(1, 6) for _ in range(4)] + [
        (b, 1) for b in range(6, 11) for _ in range(4)
    ]
    r = _splits(spark, rows)
    assert r.split_bin == 5
    assert r.score == 0.0
    assert r.n_left == 20 and r.n_right == 20
    assert r.pos_left == 0 and r.pos_right == 20


def test_counts_partition_the_data(spark):
    rows = [(1, 0), (1, 1), (2, 1), (3, 0), (3, 1), (3, 1)]
    r = _splits(spark, rows)
    assert r.n_left + r.n_right == 6
    assert r.pos_left + r.pos_right == 4


def test_tie_breaks_on_smaller_bin(spark):
    # symmetric impurity: bins 1 and 3 give identical scores; bin 1
    # must win the tie
    rows = [(1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1), (4, 0), (4, 1)]
    r = _splits(spark, rows)
    assert r.split_bin == 1


def test_multiple_features_one_row_each(spark):
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 1), (3, 30, 1)], ["a", "b", "y"]
    )
    out = histogram_best_splits(
        df, {"a": F.col("a"), "b": F.col("b")}, F.col("y") == 1
    ).collect()
    assert sorted(r.feature for r in out) == ["a", "b"]
    by = {r.feature: r for r in out}
    # both features separate perfectly at their first bin
    assert by["a"].split_bin == 1 and by["a"].score == 0.0
    assert by["b"].split_bin == 10 and by["b"].score == 0.0
