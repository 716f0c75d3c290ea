"""Keyed time-series diagnostics (operators/timeseries)."""

from datetime import datetime, timedelta

import pytest

from computer_vision_foundations_spark.operators.timeseries import (
    cusum_changepoint,
    hourly_counts,
    lag1_autocorr,
)


def _events(spark, counts_by_hour, key="a"):
    """One event row per unit of count, hour i = base + i hours."""
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i, c in enumerate(counts_by_hour):
        for _ in range(c):
            rows.append((key, base + timedelta(hours=i, minutes=5), eid))
            eid += 1
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, event_id long"
    )


def test_hourly_counts(spark):
    df = _events(spark, [2, 0, 3])
    got = sorted(
        (r["bucket"].hour, r["cnt"])
        for r in hourly_counts(df).collect()
    )
    # hour 1 has no events -> absent, not zero
    assert got == [(0, 2), (2, 3)]


def test_alternating_series_has_negative_autocorr(spark):
    df = _events(spark, [5, 1, 5, 1, 5, 1, 5, 1])
    r = lag1_autocorr(df).collect()[0]
    assert r["n_buckets"] == 8
    assert r["r1"] == pytest.approx(-1.0, abs=1e-6)


def test_trending_series_has_positive_autocorr(spark):
    df = _events(spark, [1, 2, 3, 4, 5, 6, 7, 8])
    assert lag1_autocorr(df).collect()[0]["r1"] > 0.9


def test_cusum_finds_the_level_shift(spark):
    # level 2 for 6 hours, then level 10: CUSUM peaks at the last
    # low bucket (hour 5)
    df = _events(spark, [2, 2, 2, 2, 2, 2, 10, 10, 10, 10, 10, 10])
    r = cusum_changepoint(df).collect()[0]
    assert r["changepoint"].hour == 5
    assert r["stat"] > 0.8  # strong evidence


def test_cusum_constant_series_has_null_stat(spark):
    df = _events(spark, [3, 3, 3, 3])
    r = cusum_changepoint(df).collect()[0]
    assert r["stat"] is None
