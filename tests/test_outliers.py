"""Robust MAD outlier summary (operators/outliers)."""

import pytest

from computer_vision_foundations_spark.operators.outliers import (
    mad_outlier_summary,
)


def test_mad_flags_only_the_extreme_point(spark):
    # key "a": values 1..9 plus a 1000 spike. med=5.5, MAD small,
    # only the spike crosses the 3.5 modified-z threshold.
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = mad_outlier_summary(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 10
    assert r["med"] == pytest.approx(5.5)
    # deviations from 5.5: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5
    assert r["mad"] == pytest.approx(2.5)
    assert r["n_outliers"] == 1
    assert r["max_mod_z"] == pytest.approx(0.6745 * 994.5 / 2.5, abs=1e-6)


def test_constant_key_flags_nothing(spark):
    df = spark.createDataFrame(
        [("c", 3.0)] * 5 + [("c", 99.0)],
        "event_type string, value double",
    )
    r = mad_outlier_summary(df).collect()[0]
    # majority constant → MAD 0 → modified z defined as 0, no flags
    assert r["mad"] == 0.0
    assert r["n_outliers"] == 0
    assert r["max_mod_z"] == 0.0


def test_keys_are_independent(spark):
    rows = [("a", float(v)) for v in (1, 2, 3)] + [
        ("b", float(v)) for v in (100, 200, 300, 10_000)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["key"]: r for r in mad_outlier_summary(df).collect()}
    assert got["a"]["med"] == 2.0
    assert got["b"]["med"] == 250.0
    assert got["a"]["n_outliers"] == 0
