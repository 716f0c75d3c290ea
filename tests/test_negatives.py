import numpy as np
import pytest

from computer_vision_foundations_spark.operators.negatives import (
    hard_negative_mining,
    label_noise_scores,
)


@pytest.fixture(scope="module")
def emb(spark):
    # two tight clusters: label 0 near e1, label 1 near e2; vec 99 is
    # labeled 0 but sits in cluster 1 (a planted mislabel)
    rows = []
    for i in range(5):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))
    for i in range(5, 10):
        rows.append((i, [0.0, 0.01 * i, 1.0, 0.0], 1))
    rows.append((99, [0.0, 0.0, 1.0, 0.01], 0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def test_hard_negatives_exclude_same_label(emb):
    anchors = emb.filter("vec_id = 0")
    out = hard_negative_mining(emb, anchors, k=10).collect()
    neg_ids = {r["negative_id"] for r in out}
    assert neg_ids == {5, 6, 7, 8, 9}  # only label-1 rows
    assert all(r["anchor_id"] == 0 for r in out)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == [1, 2, 3, 4, 5]


def test_hard_negatives_are_hardest_first(emb):
    # anchor 99 (labeled 0) points into cluster 1: its top negative is
    # its true nearest neighbor there
    anchors = emb.filter("vec_id = 99")
    out = sorted(
        hard_negative_mining(emb, anchors, k=2).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["cos_sim"] > out[1]["cos_sim"] or (
        out[0]["cos_sim"] == out[1]["cos_sim"]
        and out[0]["negative_id"] < out[1]["negative_id"]
    )
    assert out[0]["negative_id"] in {5, 6, 7, 8, 9}


def test_label_noise_flags_planted_mislabel(emb):
    out = {r["vec_id"]: r for r in label_noise_scores(emb, k=2, threshold=0.5).collect()}
    # the planted mislabel is far from its own class
    assert out[99]["suspect"]
    # clean cluster members are tightly attached
    for i in range(10):
        assert not out[i]["suspect"], i


def test_label_noise_small_class_uses_weakest(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),  # class of 2: only 1 neighbor available
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [0.2, 0.8], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    out = {r["vec_id"]: r for r in label_noise_scores(df, k=3).collect()}
    assert out[1]["n_neighbors"] == 1
    assert out[3]["n_neighbors"] == 2


def test_singleton_class_emits_no_row(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1), (3, [0.1, 1.0], 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    ids = {r["vec_id"] for r in label_noise_scores(df, k=2).collect()}
    assert ids == {2, 3}
