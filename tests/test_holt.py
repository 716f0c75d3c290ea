"""Holt linear smoothing: agreement with a pure-Python recurrence,
trend recovery on a linear series, and short-series handling."""

import math

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.holt import holt_linear


def _py_holt(y, a=0.5, b=0.3):
    lvl, tr = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        new = a * y[t] + (1 - a) * (lvl + tr)
        tr = b * (new - lvl) + (1 - b) * tr
        lvl = new
    return lvl, tr


def _run(spark, series):
    rows = [
        Row(k=k, t=i, y=float(v))
        for k, ys in series.items()
        for i, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows)
    return {
        r["key"]: r for r in holt_linear(df, "k", "t", "y").collect()
    }


def test_holt_matches_python(spark):
    series = {
        "noisy": [3.0, 5.0, 4.0, 6.0, 5.5, 7.0, 6.5],
        "flat": [2.0, 2.0, 2.0, 2.0],
    }
    got = _run(spark, series)
    for k, ys in series.items():
        lvl, tr = _py_holt(ys)
        assert math.isclose(got[k]["level"], lvl, rel_tol=1e-12)
        assert math.isclose(got[k]["trend"], tr, abs_tol=1e-12)
        assert math.isclose(
            got[k]["forecast"], lvl + tr, rel_tol=1e-12
        )
        assert got[k]["n_points"] == len(ys)


def test_holt_exact_on_linear_series(spark):
    # a perfectly linear series is a fixed point: level tracks it
    # exactly and trend equals the slope from the very first step.
    ys = [10.0 + 2.0 * t for t in range(12)]
    got = _run(spark, {"lin": ys})["lin"]
    assert math.isclose(got["trend"], 2.0, rel_tol=1e-12)
    assert math.isclose(got["level"], ys[-1], rel_tol=1e-12)
    assert math.isclose(got["forecast"], ys[-1] + 2.0, rel_tol=1e-12)


def test_holt_drops_singleton_series(spark):
    got = _run(spark, {"one": [5.0], "two": [1.0, 2.0]})
    assert "one" not in got and "two" in got


def test_holt_bigint_key_roundtrips(spark):
    # the output 'key' field derives its type from the input key
    # column — bigint keys must come back as ints, not strings
    rows = [
        Row(k=1001, t=i, y=float(v))
        for i, v in enumerate([3.0, 5.0, 4.0, 6.0])
    ]
    df = spark.createDataFrame(rows)
    out = holt_linear(df, "k", "t", "y")
    assert out.schema["key"].dataType.simpleString() == "bigint"
    got = {r["key"]: r for r in out.collect()}
    assert 1001 in got and got[1001]["n_points"] == 4
