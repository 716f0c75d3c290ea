"""As-of join operator, differentially tested against pandas
``merge_asof`` (the de-facto reference semantics, shared by DuckDB's
ASOF JOIN: greatest right_ts <= left_ts per key, ties inclusive)."""

import datetime as dt
import random

import pandas as pd

from computer_vision_foundations_spark.operators.asof import as_of_join

BASE = dt.datetime(2024, 1, 1)


def _frames(spark, seed=7, n_left=60, n_right=40, n_keys=5):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(n_keys), BASE + dt.timedelta(seconds=rng.randrange(10_000)))
        for i in range(n_left)
    ]
    # unique (key, ts) on the right, as the operator contract requires
    seen, right = set(), []
    while len(right) < n_right:
        k = rng.randrange(n_keys)
        ts = BASE + dt.timedelta(seconds=rng.randrange(10_000))
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        right.append((len(right) + 1000, k, ts, rng.random()))
    ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(right, ["rid", "k", "ts", "val"])
    lpd = pd.DataFrame(left, columns=["lid", "k", "ts"])
    rpd = pd.DataFrame(right, columns=["rid", "k", "ts", "val"])
    return ldf, rdf, lpd, rpd


def _pandas_asof(lpd, rpd, direction="backward", tolerance=None):
    out = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values("ts", kind="stable").rename(columns={"ts": "ts_right"}),
        left_on="ts",
        right_on="ts_right",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    return out.set_index("lid").sort_index()


def _spark_asof(ldf, rdf, **kw):
    out = as_of_join(ldf, rdf, on="k", **kw).toPandas()
    return out.set_index("lid").sort_index()


def _assert_matches(got, exp):
    assert list(got.index) == list(exp.index)
    for col in ("rid", "val", "ts_right"):
        g, e = got[col], exp[col]
        assert ((g == e) | (g.isna() & e.isna())).all(), col


def test_backward_matches_pandas(spark):
    ldf, rdf, lpd, rpd = _frames(spark)
    _assert_matches(_spark_asof(ldf, rdf), _pandas_asof(lpd, rpd))


def test_forward_matches_pandas(spark):
    ldf, rdf, lpd, rpd = _frames(spark, seed=11)
    _assert_matches(
        _spark_asof(ldf, rdf, direction="forward"),
        _pandas_asof(lpd, rpd, direction="forward"),
    )


def test_tolerance_matches_pandas(spark):
    ldf, rdf, lpd, rpd = _frames(spark, seed=13)
    _assert_matches(
        _spark_asof(ldf, rdf, tolerance="'10' MINUTE"),
        _pandas_asof(lpd, rpd, tolerance=pd.Timedelta(minutes=10)),
    )


def test_equal_timestamp_is_inclusive(spark):
    ts = BASE
    ldf = spark.createDataFrame([(1, 0, ts)], ["lid", "k", "ts"])
    rdf = spark.createDataFrame([(9, 0, ts, 0.5)], ["rid", "k", "ts", "val"])
    row = as_of_join(ldf, rdf, on="k").collect()[0]
    assert row.rid == 9 and row.val == 0.5


def test_no_match_yields_nulls(spark):
    ldf = spark.createDataFrame([(1, 0, BASE)], ["lid", "k", "ts"])
    rdf = spark.createDataFrame(
        [(9, 0, BASE + dt.timedelta(hours=1), 0.5)], ["rid", "k", "ts", "val"]
    )
    row = as_of_join(ldf, rdf, on="k").collect()[0]
    assert row.rid is None and row.val is None and row.ts_right is None


def test_single_shuffle_plan(spark):
    ldf, rdf, _, _ = _frames(spark)
    plan = as_of_join(ldf, rdf, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
