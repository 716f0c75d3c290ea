"""Semantics tests for the round-9 operators: l-diversity
(operators/privacy.py) and the per-key KS drift battery
(operators/stats_tests.py). The streaming dedup equivalence is
differential-gate attested (q10, formerly za51) and its building block
(streaming/windows.dedup_stream) has its own streaming tests."""

import math

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.privacy import (
    l_diversity_report,
)
from computer_vision_foundations_spark.operators.stats_tests import (
    keyed_ks_drift,
)


def test_l_diversity_uniform_class(spark):
    # 4 values uniformly -> distinct_l = 4, entropy_l = 4 exactly
    rows = [("A", v) for v in (1, 2, 3, 4) * 3]
    df = spark.createDataFrame(rows, "seg string, sens int")
    r = l_diversity_report(df, ["seg"], "sens", l=3).first()
    assert r["class_size"] == 12
    assert r["distinct_l"] == 4
    assert r["entropy_l"] == pytest.approx(4.0, abs=1e-6)
    assert r["distinct_ok"] and r["entropy_ok"]


def test_l_diversity_skewed_class_fails_entropy(spark):
    # 10 distinct values but 91% mass on one: distinct-l passes,
    # entropy-l (the stricter test) fails — the paper's motivating gap
    rows = [("A", 0)] * 91 + [("A", v) for v in range(1, 10)]
    df = spark.createDataFrame(rows, "seg string, sens int")
    r = l_diversity_report(df, ["seg"], "sens", l=3).first()
    assert r["distinct_l"] == 10 and r["distinct_ok"]
    assert not r["entropy_ok"]
    # exp(H) for this distribution, computed independently
    import collections

    n = 100
    counts = collections.Counter([0] * 91 + list(range(1, 10)))
    h = -sum((c / n) * math.log(c / n) for c in counts.values())
    assert r["entropy_l"] == pytest.approx(math.exp(h), abs=1e-5)


def test_l_diversity_constant_class(spark):
    df = spark.createDataFrame([("A", 7)] * 5, "seg string, sens int")
    r = l_diversity_report(df, ["seg"], "sens", l=2).first()
    assert r["distinct_l"] == 1
    assert r["entropy_l"] == pytest.approx(1.0, abs=1e-9)
    assert not r["distinct_ok"] and not r["entropy_ok"]


def test_l_diversity_null_sensitive_is_a_value(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", None), ("A", None)], "seg string, sens int"
    )
    r = l_diversity_report(df, ["seg"], "sens", l=2).first()
    assert r["distinct_l"] == 2  # NULL counts as its own value


def test_keyed_ks_identical_halves_zero(spark):
    rows = [("k1", float(v), s) for v in range(10) for s in (True, False)]
    df = spark.createDataFrame(rows, "k string, v double, a boolean")
    r = keyed_ks_drift(df, "k", "v", F.col("a")).first()
    assert r["ks_d"] == 0.0 and not r["drifted"]
    assert r["n_a"] == 10 and r["n_b"] == 10


def test_keyed_ks_disjoint_supports_is_one(spark):
    rows = [("k1", float(v), True) for v in range(10)] + [
        ("k1", float(v + 100), False) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v double, a boolean")
    r = keyed_ks_drift(df, "k", "v", F.col("a")).first()
    assert r["ks_d"] == 1.0 and r["drifted"]


def test_keyed_ks_keys_independent_and_one_sided_dropped(spark):
    rows = (
        [("stable", float(v % 5), s) for v in range(20) for s in (True, False)]
        + [("shifted", float(v), True) for v in range(20)]
        + [("shifted", float(v + 50), False) for v in range(20)]
        + [("only_a", 1.0, True)] * 3  # no b sample -> dropped
    )
    df = spark.createDataFrame(rows, "k string, v double, a boolean")
    out = {r["k"]: r for r in keyed_ks_drift(df, "k", "v", F.col("a")).collect()}
    assert set(out) == {"stable", "shifted"}
    assert out["stable"]["ks_d"] == 0.0
    assert out["shifted"]["ks_d"] == 1.0 and out["shifted"]["drifted"]
