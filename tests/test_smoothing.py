"""Closed-form EWMA (operators/smoothing)."""

import pytest

from computer_vision_foundations_spark.operators.smoothing import (
    ewma_by_key,
)


def _recursive_ewma(xs, alpha):
    s = xs[0]
    for x in xs[1:]:
        s = alpha * x + (1 - alpha) * s
    return s


def test_closed_form_equals_recursion(spark):
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [(1, i, float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts double, value double"
    )
    r = ewma_by_key(df, alpha=0.3).collect()[0]
    assert r["n"] == len(xs)
    assert r["last_x"] == xs[-1]
    assert r["ewma"] == pytest.approx(
        _recursive_ewma(xs, 0.3), abs=1e-6
    )


def test_single_observation_is_identity(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 42.0)],
        "user_id long, event_id long, ts double, value double",
    )
    r = ewma_by_key(df).collect()[0]
    assert r["ewma"] == 42.0
    assert r["last_x"] == 42.0


def test_tiebreak_makes_equal_timestamps_deterministic(spark):
    # two rows share ts; event_id orders them → x=10 first, x=0 last
    df = spark.createDataFrame(
        [(1, 1, 5.0, 10.0), (1, 2, 5.0, 0.0)],
        "user_id long, event_id long, ts double, value double",
    )
    r = ewma_by_key(df, alpha=0.5).collect()[0]
    assert r["ewma"] == pytest.approx(0.5 * 0.0 + 0.5 * 10.0)
    assert r["last_x"] == 0.0


def test_keys_do_not_mix(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 1.0), (2, 1, 0.0, 100.0)],
        "user_id long, event_id long, ts double, value double",
    )
    got = {r["key"]: r["ewma"] for r in ewma_by_key(df).collect()}
    assert got == {1: 1.0, 2: 100.0}
