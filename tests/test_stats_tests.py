"""Classical statistics kit (operators/stats_tests)."""

from datetime import datetime, timedelta

import math

import pytest

from computer_vision_foundations_spark.operators.stats_tests import (
    ks_two_sample,
    ols_by_key,
    wilson_intervals,
)


def test_wilson_matches_hand_formula(spark):
    # 3 users enter via 'click' (2 convert), 2 via 'view' (0 convert)
    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def add(u, seq):
        nonlocal eid
        for i, t in enumerate(seq):
            rows.append((u, base + timedelta(minutes=i), t, eid))
            eid += 1

    add(1, ["click", "purchase"])
    add(2, ["click", "purchase"])
    add(3, ["click"])
    add(4, ["view"])
    add(5, ["view", "click"])
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )
    got = {r["key"]: r for r in wilson_intervals(df).collect()}
    r = got["click"]
    assert (r["n"], r["conv"]) == (3, 2)
    z = 1.959964
    p, n = 2 / 3, 3.0
    center = (p + z * z / (2 * n)) / (1 + z * z / n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / (
        1 + z * z / n
    )
    assert r["wilson_lo"] == pytest.approx(center - half, abs=1e-6)
    assert r["wilson_hi"] == pytest.approx(center + half, abs=1e-6)
    # CI is inside [0, 1] even at rate 0 (the Wald interval wouldn't be)
    v = got["view"]
    assert v["rate"] == 0.0 and v["wilson_lo"] == 0.0 and v["wilson_hi"] > 0


def test_ols_recovers_planted_line(spark):
    base = datetime(2024, 1, 1)
    rows = [
        ("k", base + timedelta(hours=h), 3.0 * h + 7.0, h)
        for h in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double, event_id long"
    )
    r = ols_by_key(df).collect()[0]
    assert r["slope"] == pytest.approx(3.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)
    # x is centered at the key's first observation → intercept is the
    # fitted value at the series start
    assert r["intercept"] == pytest.approx(7.0, abs=1e-6)


def test_ks_extremes(spark):
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v) + 100.0) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = ks_two_sample(df, "value", "event_type", "a", "b").collect()[0]
    assert r["ks_d"] == 1.0  # disjoint supports
    same = spark.createDataFrame(
        [("a", float(v % 5)) for v in range(20)]
        + [("b", float(v % 5)) for v in range(20)],
        "event_type string, value double",
    )
    r2 = ks_two_sample(same, "value", "event_type", "a", "b").collect()[0]
    assert r2["ks_d"] == 0.0  # identical distributions


def test_ks_matches_scipy_style_hand_case(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [("a", x) for x in a] + [("b", x) for x in b],
        "event_type string, value double",
    )
    r = ks_two_sample(df, "value", "event_type", "a", "b").collect()[0]
    # ECDF gap is max at x=2: Fa=0.5, Fb=0 -> D=0.5
    assert r["ks_d"] == pytest.approx(0.5)


def test_bh_fdr_step_up_rule(spark):
    """The step-up rule rejects a hypothesis whose OWN criterion
    fails when a later rank qualifies (the classic BH subtlety a
    per-row comparison gets wrong)."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        bh_fdr,
    )

    # m=4, q=0.25 -> criteria 0.0625, 0.125, 0.1875, 0.25
    # p = [0.01, 0.13, 0.19, 0.24]: rank2 fails its own criterion
    # (0.13 > 0.125) but rank4 qualifies (0.24 <= 0.25) => ALL reject
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.13), ("c", 0.19), ("d", 0.24)],
        "h string, p double",
    )
    out = {r["h"]: r for r in bh_fdr(df, "p", ["h"], q=0.25).collect()}
    assert all(out[h]["reject"] for h in "abcd")
    assert out["b"]["p_value"] == 0.13 and out["b"]["p_rank"] == 2
    # nothing qualifies anywhere -> nothing rejected
    df2 = spark.createDataFrame(
        [("a", 0.30), ("b", 0.60), ("c", 0.90)], "h string, p double"
    )
    out2 = bh_fdr(df2, "p", ["h"], q=0.25).collect()
    assert not any(r["reject"] for r in out2)
    # independent-of-order: only ranks <= i* reject
    df3 = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.5), ("d", 0.9)],
        "h string, p double",
    )
    out3 = {r["h"]: r["reject"] for r in bh_fdr(df3, "p", ["h"], q=0.1).collect()}
    assert out3 == {"a": True, "b": True, "c": False, "d": False}


def test_keyed_ks_pvalues_identical_distribution(spark):
    """Identical halves -> D = 0 -> p = 1 (clipped)."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        keyed_ks_pvalues,
    )
    from pyspark.sql import functions as F

    rows = [("k", float(v), s) for v in range(20) for s in (0, 1)]
    df = spark.createDataFrame(rows, "k string, value double, side int")
    out = keyed_ks_pvalues(
        df, "k", "value", F.col("side") == 1
    ).collect()
    assert len(out) == 1 and out[0]["p"] == 1.0


def test_keyed_ks_pvalues_disjoint_support(spark):
    """Fully separated samples -> D = 1 -> p = 2*exp(-2*n_eff)."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        keyed_ks_pvalues,
    )
    from pyspark.sql import functions as F

    rows = [("k", float(v), 1) for v in range(10)] + [
        ("k", float(v + 100), 0) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, value double, side int")
    out = keyed_ks_pvalues(df, "k", "value", F.col("side") == 1).collect()
    expect = 2.0 * math.exp(-2.0 * 1.0 * (10.0 * 10 / 20))
    assert out[0]["p"] == pytest.approx(expect, rel=1e-12)


def test_weighted_quantiles_hand_case(spark):
    """Weighted median by hand: values 1,2,3 with weights 1,1,6 ->
    p50 lands on 3 (cumw 2/8 < 4 <= 8/8); p25 on 2 (cumw 2*1e4 >=
    2500*8)."""
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 6)], "v double, w long"
    )
    out = {r["p"]: r["value"] for r in weighted_quantiles(df, "v", "w").collect()}
    assert out[0.25] == 2.0 and out[0.5] == 3.0 and out[0.99] == 3.0
    # duplicate values pool their weights before the cumulative pass
    df2 = spark.createDataFrame(
        [(1.0, 3), (1.0, 3), (2.0, 1)], "v double, w long"
    )
    out2 = {r["p"]: r["value"] for r in weighted_quantiles(df2, "v", "w").collect()}
    assert out2[0.5] == 1.0 and out2[0.9] == 2.0


def test_weighted_quantiles_fractional_weights_floor(spark):
    """Fractional weights integerize by floor() on BOTH engines —
    2.5 counts as 2, 0.9 contributes nothing."""
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0, 0.9), (2.0, 2.5), (3.0, 2.0)], "v double, w double"
    )
    # floored weights: 0, 2, 2 -> W=4; p50 threshold cumw>=2 -> v=2
    out = {r["p"]: r for r in weighted_quantiles(df, "v", "w").collect()}
    assert out[0.5]["value"] == 2.0
    assert out[0.5]["total_weight"] == 4
