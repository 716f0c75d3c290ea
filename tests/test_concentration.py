"""Concentration analytics (operators/concentration) + new
time-series estimators (Theil-Sen, seasonality strength)."""

from datetime import datetime, timedelta

import pytest

from computer_vision_foundations_spark.operators.concentration import (
    abc_classes,
    gini_index,
)
from computer_vision_foundations_spark.operators.timeseries import (
    seasonality_strength,
    theil_sen_slope,
)


def test_abc_classes_textbook(spark):
    # values: 80, 15, 4, 1 → cum shares 0.8, 0.95, 0.99, 1.0
    rows = [("p1", 80.0), ("p2", 15.0), ("p3", 4.0), ("p4", 1.0)]
    df = spark.createDataFrame(rows, "part string, rev double")
    got = {r["unit"]: r["cls"] for r in abc_classes(df, "part", "rev").collect()}
    # inclusive first-crossing: p1 starts at 0 (<0.8) → A;
    # p2 starts at 0.8 (<0.95) → B; p3 at 0.95 → C; p4 → C
    assert got == {"p1": "A", "p2": "B", "p3": "C", "p4": "C"}


def test_gini_extremes(spark):
    even = spark.createDataFrame(
        [(f"u{i}", 10.0) for i in range(10)], "unit string, v double"
    )
    assert gini_index(even, "unit", "v").collect()[0]["gini"] == 0.0
    skew = spark.createDataFrame(
        [("a", 100.0)] + [(f"u{i}", 1e-9) for i in range(9)],
        "unit string, v double",
    )
    g = gini_index(skew, "unit", "v").collect()[0]["gini"]
    assert g == pytest.approx(0.9, abs=1e-3)  # (n-1)/n for one holder


def test_gini_hand_value(spark):
    # values 1,2,3,4: G = sum((2i-n-1)x_i)/(n*sum) with ascending order
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0)],
        "unit string, v double",
    )
    want = sum((2 * i - 4 - 1) * x for i, x in enumerate([1, 2, 3, 4], 1)) / (
        4 * 10
    )
    assert gini_index(df, "unit", "v").collect()[0]["gini"] == pytest.approx(
        want, abs=1e-6
    )


def _events(spark, counts_by_hour, key="a"):
    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    for i, c in enumerate(counts_by_hour):
        for _ in range(c):
            rows.append((key, base + timedelta(hours=i, minutes=1), eid))
            eid += 1
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, event_id long"
    )


def test_theil_sen_linear_series(spark):
    # counts 1..8 → every pairwise slope is exactly 1/hour
    df = _events(spark, list(range(1, 9)))
    r = theil_sen_slope(df).collect()[0]
    assert r["slope"] == pytest.approx(1.0, abs=1e-6)


def test_theil_sen_resists_outlier(spark):
    # linear trend 1..9 with one spike: median slope stays ~1
    df = _events(spark, [1, 2, 3, 4, 50, 6, 7, 8, 9])
    r = theil_sen_slope(df).collect()[0]
    assert abs(r["slope"] - 1.0) < 0.5


def test_seasonality_periodic_vs_noise(spark):
    # perfect period-24 pattern over 3 days → strength 1
    pattern = [5, 1] * 12
    df = _events(spark, pattern * 3)
    r = seasonality_strength(df).collect()[0]
    assert r["strength"] == pytest.approx(1.0, abs=1e-6)
    # constant series → var 0 → NULL
    flat = _events(spark, [3] * 48, key="b")
    r2 = seasonality_strength(flat).collect()[0]
    assert r2["strength"] is None
