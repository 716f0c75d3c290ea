"""Item-item CF: cosine from basket incidence, caps and thresholds."""

from computer_vision_foundations_spark.operators.cf import item_cosine_pairs


def test_cosine_closed_form(spark):
    # item A in baskets {1,2,3}, item B in {2,3,4} → cooc 2,
    # cosine = 2/sqrt(3·3) = 2/3
    rows = [(1, "A"), (2, "A"), (3, "A"), (2, "B"), (3, "B"), (4, "B")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = item_cosine_pairs(df, "bk", "it", min_cooc=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.cooc) == ("A", "B", 2)
    assert r.cosine == round(2 / 3, 6)


def test_min_cooc_filters(spark):
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "C")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    assert item_cosine_pairs(df, "bk", "it", min_cooc=2).count() == 0
    assert item_cosine_pairs(df, "bk", "it", min_cooc=1).count() == 2


def test_basket_cap_drops_whale_baskets(spark):
    whale = [(0, f"i{k}") for k in range(6)]
    small = [(1, "i0"), (1, "i1"), (2, "i0"), (2, "i1")]
    df = spark.createDataFrame(whale + small, ["bk", "it"])
    out = item_cosine_pairs(
        df, "bk", "it", min_cooc=2, max_basket_size=5
    ).collect()
    # the whale basket contributes nothing: only the small-basket pair
    assert [(r.item_a, r.item_b, r.cooc) for r in out] == [("i0", "i1", 2)]
    # counts exclude the dropped basket entirely (norms too)
    assert out[0].cosine == round(2 / (2 * 2) ** 0.5, 6)
