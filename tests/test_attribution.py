"""Markov removal-effect attribution (operators/attribution)."""

from datetime import datetime, timedelta

import pytest

from computer_vision_foundations_spark.operators.attribution import (
    markov_attribution,
)


def _df(spark, journeys):
    """journeys: list of event-type sequences, one per user."""
    rows, eid = [], 0
    base = datetime(2024, 1, 1)
    for u, seq in enumerate(journeys):
        for i, ch in enumerate(seq):
            rows.append((u, base + timedelta(minutes=i), ch, eid))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )


def test_single_channel_gets_full_credit(spark):
    # every conversion goes through 'click'; 'view' never converts
    df = _df(
        spark,
        [
            ["click", "purchase"],
            ["click", "purchase"],
            ["view"],
            ["view"],
        ],
    )
    got = {r["channel"]: r for r in markov_attribution(df).collect()}
    assert got["click"]["attribution"] == pytest.approx(1.0)
    assert got["click"]["reach_without"] == pytest.approx(0.0)
    assert got["view"]["removal_effect"] == pytest.approx(0.0)
    # base reach: START -> click (p=.5) -> conv (p=1) = 0.5
    assert got["click"]["base_reach"] == pytest.approx(0.5, abs=1e-6)


def test_journey_truncates_at_first_purchase(spark):
    # events after the purchase must not create transitions
    df = _df(spark, [["click", "purchase", "error", "error"]])
    got = {r["channel"]: r for r in markov_attribution(df).collect()}
    # 'error' appears only post-conversion -> not a channel at all
    assert set(got) == {"click"}


def test_two_path_chain_hand_computed(spark):
    # paths: a->conv (x1), b->conv (x1), b->null (x1)
    df = _df(spark, [["a", "purchase"], ["b", "purchase"], ["b"]])
    got = {r["channel"]: r for r in markov_attribution(df).collect()}
    # base: START->a (1/3)*1 + START->b (2/3)*(1/2) = 2/3
    assert got["a"]["base_reach"] == pytest.approx(2 / 3, abs=1e-6)
    # remove a: reach = 2/3 * 1/2 = 1/3 -> effect = (2/3-1/3)/(2/3)=0.5
    assert got["a"]["removal_effect"] == pytest.approx(0.5, abs=1e-6)
    # remove b: reach = 1/3 -> effect = 0.5 ; equal shares
    assert got["a"]["attribution"] == pytest.approx(0.5, abs=1e-6)
    assert got["b"]["attribution"] == pytest.approx(0.5, abs=1e-6)
