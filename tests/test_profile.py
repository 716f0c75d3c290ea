"""One-pass table profiler (operators/profile.py)."""

import pytest

import pyspark.sql.functions as F

from computer_vision_foundations_spark.operators.profile import (
    profile_table,
)


@pytest.fixture
def frame(spark):
    rows = [
        (1, 10.5, "alpha"),
        (2, None, "beta"),
        (3, 2.25, None),
        (3, 2.25, "alpha"),
        (None, -1.0, "gamma"),
    ]
    return spark.createDataFrame(rows, "k long, v double, s string")


def test_profile_counts_nulls_ndv_extrema(frame):
    out = {r.column: r for r in profile_table(frame).collect()}
    assert set(out) == {"k", "v", "s"}
    k = out["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (5, 1, 3)
    assert (k.min_num, k.max_num) == (1.0, 3.0)
    assert k.min_str is None and k.max_str is None
    v = out["v"]
    assert (v.n_nulls, v.n_distinct) == (1, 3)
    assert (v.min_num, v.max_num) == (-1.0, 10.5)
    s = out["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 3)
    assert (s.min_str, s.max_str) == ("alpha", "gamma")
    assert s.min_num is None and s.max_num is None


def test_profile_column_subset_and_rounding(spark):
    df = spark.createDataFrame(
        [(0.123456789,), (9.987654321,)], "x double"
    )
    row = profile_table(df, ["x"], round_digits=3).collect()[0]
    assert (row.min_num, row.max_num) == (0.123, 9.988)


def test_profile_approx_ndv_close(spark):
    df = spark.range(0, 10_000).select((F.col("id") % 500).alias("m"))
    row = profile_table(df, ["m"], exact_ndv=False).collect()[0]
    assert abs(row.n_distinct - 500) <= 25  # HLL++ default ~2% rsd
    # and the approx plan has no Expand (the exact multi-distinct does)
    plan = (
        profile_table(df, ["m"], exact_ndv=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_profile_rejects_unsupported_and_empty(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(ValueError):
        profile_table(df, ["a"])
    with pytest.raises(ValueError):
        profile_table(df)  # no numeric/string columns at all
