"""Kernel density estimation (operators/density)."""

import math

import pytest

from computer_vision_foundations_spark.operators.density import (
    kde_at_grid,
)


def _ref_kde(xs, g, h):
    return sum(
        math.exp(-((x - g) ** 2) / (2 * h * h)) for x in xs
    ) / (len(xs) * h * math.sqrt(2 * math.pi))


def test_kde_matches_python_reference(spark):
    xs = [1.0, 2.0, 2.5, 8.0, 9.0]
    df = spark.createDataFrame(
        [("k", x) for x in xs], "event_type string, value double"
    )
    grid = [0.0, 2.0, 5.0, 9.0]
    got = {
        r["g"]: r["density"]
        for r in kde_at_grid(df, "value", "event_type", grid, 1.0).collect()
    }
    for g in grid:
        assert got[g] == pytest.approx(_ref_kde(xs, g, 1.0), abs=1e-6)
    # bimodal data: density at the modes beats the valley
    assert got[2.0] > got[5.0] and got[9.0] > got[5.0]


def test_kde_integrates_to_one_roughly(spark):
    import random

    rng = random.Random(2)
    xs = [rng.gauss(50, 10) for _ in range(500)]
    df = spark.createDataFrame(
        [("k", x) for x in xs], "event_type string, value double"
    )
    grid = [float(g) for g in range(0, 101, 2)]
    got = kde_at_grid(df, "value", "event_type", grid, 5.0).collect()
    integral = sum(r["density"] for r in got) * 2.0  # trapezoidal-ish
    assert integral == pytest.approx(1.0, abs=0.05)


def test_kde_keys_independent(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("b", 100.0)], "event_type string, value double"
    )
    got = {
        (r["key"], r["g"]): r["density"]
        for r in kde_at_grid(df, "value", "event_type", [0.0], 1.0).collect()
    }
    assert got[("a", 0.0)] > 0.3
    assert got[("b", 0.0)] == pytest.approx(0.0, abs=1e-6)
