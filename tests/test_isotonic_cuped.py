"""Isotonic calibration (minimax PAV) and CUPED closed-form checks."""

import datetime

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.cuped import cuped_lift
from computer_vision_foundations_spark.operators.isotonic import (
    isotonic_calibration,
)


def _iso(spark, rows):
    df = spark.createDataFrame(rows, ["b", "y"])
    return {
        r.bin: r
        for r in isotonic_calibration(
            df, F.col("b"), F.col("y") == 1
        ).collect()
    }


def test_monotone_input_is_unchanged(spark):
    rows = (
        [(0, 0)] * 9 + [(0, 1)] * 1
        + [(1, 0)] * 5 + [(1, 1)] * 5
        + [(2, 0)] * 1 + [(2, 1)] * 9
    )
    out = _iso(spark, rows)
    for b in (0, 1, 2):
        assert out[b].iso_rate == out[b].rate


def test_violation_pools_to_weighted_mean(spark):
    # rates 0.8 then 0.2 violate monotonicity → PAV pools both bins
    # to the weighted mean 0.5; a later bin at 0.9 stays
    rows = (
        [(0, 1)] * 8 + [(0, 0)] * 2
        + [(1, 1)] * 2 + [(1, 0)] * 8
        + [(2, 1)] * 9 + [(2, 0)] * 1
    )
    out = _iso(spark, rows)
    assert out[0].iso_rate == out[1].iso_rate == 0.5
    assert out[2].iso_rate == 0.9
    # fit is non-decreasing
    fits = [out[b].iso_rate for b in sorted(out)]
    assert fits == sorted(fits)


def test_cuped_perfect_covariate_kills_variance(spark):
    # every user's post value equals their pre value → θ = 1,
    # r² = 1, and the adjusted lift is exactly 0
    pre = datetime.datetime(2024, 1, 10)
    post = datetime.datetime(2024, 1, 20)
    rows = []
    for u in range(40):
        v = float(10 + (u * 7) % 23)
        rows.append((u, pre, v))
        rows.append((u, post, v))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    r = cuped_lift(df).collect()[0]
    assert r.n_treat + r.n_ctrl == 40
    assert r.theta == 1.0
    assert r.var_reduction == 1.0
    assert r.lift_cuped == 0.0
