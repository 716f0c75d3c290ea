"""Benford first-digit audit (operators/benford)."""

import math

import pytest

from computer_vision_foundations_spark.operators.benford import (
    benford_digits,
)


def test_digit_extraction_and_grid(spark):
    vals = [1.0, 19.5, 0.002, 900.0, 0.95, -33.0, 0.0, None]
    df = spark.createDataFrame(
        [(v,) for v in vals], "value double"
    )
    got = {r["digit"]: r for r in benford_digits(df).collect()}
    # digits: 1(1.0), 1(19.5), 2(0.002), 9(900), 9(0.95), 3(-33); 0/None dropped
    assert len(got) == 9  # full grid 1..9
    counts = {d: got[d]["n"] for d in got}
    assert counts == {1: 2, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 2}
    n_total = 6
    for d in range(1, 10):
        exp = n_total * math.log10(1 + 1 / d)
        assert got[d]["expected"] == pytest.approx(exp, abs=1e-6)
        assert got[d]["chi2"] == pytest.approx(
            (counts[d] - exp) ** 2 / exp, abs=1e-5
        )


def test_benford_like_data_has_small_chi2(spark):
    # log-uniform over whole decades follows Benford exactly in the
    # limit: x = 10^(i/N) for i in [0, 4N)
    vals = [10.0 ** (i / 2500.0) for i in range(10000)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    chi2 = sum(r["chi2"] for r in benford_digits(df).collect())
    # chi-square with 8 dof: 0.05 critical value is 15.5
    assert chi2 < 15.5
