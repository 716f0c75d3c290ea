"""Market-basket rules (operators/basket)."""

import pytest

from computer_vision_foundations_spark.operators.basket import (
    basket_pair_rules,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "bk long, it string")


def test_rule_algebra_hand_computed(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {c}
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"),
    ]
    got = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pair_rules(_df(spark, rows), "bk", "it").collect()
    }
    # only (a,b) reaches min_pair_count=2
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["n_both"] == 2
    assert r["support"] == pytest.approx(2 / 4)
    assert r["confidence"] == pytest.approx(2 / 3)  # P(b|a)
    # lift = (2/4) / ((3/4)*(2/4)) = 4/3
    assert r["lift"] == pytest.approx(4 / 3, abs=1e-6)


def test_duplicate_items_in_basket_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = basket_pair_rules(
        _df(spark, rows), "bk", "it", min_pair_count=2
    ).collect()
    assert len(got) == 1 and got[0]["n_both"] == 2


def test_mega_basket_cap_drops_basket(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [
        (2, "i0"), (2, "i1"),
        (3, "i0"), (3, "i1"),
    ]
    got = basket_pair_rules(
        _df(spark, rows), "bk", "it", min_pair_count=2, max_basket_items=5
    ).collect()
    # basket 1 (10 items > cap) is dropped; (i0,i1) counted in 2 & 3
    assert len(got) == 1
    assert got[0]["n_both"] == 2
    assert got[0]["support"] == pytest.approx(1.0)  # 2 of 2 surviving
