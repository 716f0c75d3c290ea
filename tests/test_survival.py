"""Kaplan-Meier survival (operators/survival)."""

from datetime import datetime, timedelta

import pytest

from computer_vision_foundations_spark.operators.survival import (
    activity_spans,
    kaplan_meier,
)


def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, duration_h long, observed int"
    )


def test_km_textbook_curve(spark):
    # classic small example: deaths at t=1 (1 of 5), t=3 (2 of 3);
    # censored at t=2 and t=4
    spans = _spans_df(
        spark,
        [
            (1, 1, 1),
            (2, 2, 0),
            (3, 3, 1),
            (4, 3, 1),
            (5, 4, 0),
        ],
    )
    got = {
        r["duration_h"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier(spans).collect()
    }
    # only death times appear
    assert set(got) == {1, 3}
    assert got[1] == (5, 1, pytest.approx(0.8))
    # S(3) = 0.8 * (1 - 2/3) = 0.266667
    assert got[3][0] == 3 and got[3][1] == 2
    assert got[3][2] == pytest.approx(0.266667, abs=1e-6)


def test_km_hits_zero_when_all_die_last(spark):
    spans = _spans_df(spark, [(1, 1, 1), (2, 2, 1)])
    got = {
        r["duration_h"]: r["survival"]
        for r in kaplan_meier(spans).collect()
    }
    assert got[1] == pytest.approx(0.5)
    assert got[2] == 0.0  # d/n = 1 at the last time


def test_activity_spans_censoring(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # user 1: active 10h, last event far from horizon -> observed
        (1, base),
        (1, base + timedelta(hours=10)),
        # user 2: still active at the horizon -> censored
        (2, base + timedelta(hours=95)),
        (2, base + timedelta(hours=100)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {
        r["id"]: (r["duration_h"], r["observed"])
        for r in activity_spans(df, censor_hours=24).collect()
    }
    assert got[1] == (10, 1)
    assert got[2] == (5, 0)
