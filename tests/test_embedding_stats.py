import math

import pytest

from computer_vision_foundations_spark.operators.embedding_stats import (
    class_compactness,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def test_identical_members_perfectly_compact(spark):
    df = _df(spark, [(i, [3.0, 4.0], 0) for i in range(4)])
    out = class_compactness(df).collect()[0]
    assert out["n"] == 4
    assert out["centroid_norm"] == pytest.approx(5.0)
    assert out["mean_cos"] == pytest.approx(1.0)


def test_antipodal_members_cancel(spark):
    # centroid of {+e1, -e1} is 0 -> guarded cosine 0, norm 0
    df = _df(spark, [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 0)])
    out = class_compactness(df).collect()[0]
    assert out["centroid_norm"] == 0.0
    assert out["mean_cos"] == 0.0


def test_compact_class_beats_diffuse_class(spark):
    tight = [(i, [1.0, 0.01 * i], 0) for i in range(4)]
    spread = [
        (10, [1.0, 0.0], 1),
        (11, [0.0, 1.0], 1),
        (12, [0.7, 0.7], 1),
        (13, [-0.2, 1.0], 1),
    ]
    out = {r["label"]: r for r in class_compactness(_df(spark, tight + spread)).collect()}
    assert out[0]["mean_cos"] > out[1]["mean_cos"]
    assert out[0]["mean_cos"] > 0.999


def test_zero_vector_member_guarded(spark):
    df = _df(spark, [(1, [0.0, 0.0], 0), (2, [2.0, 0.0], 0)])
    out = class_compactness(df).collect()[0]
    # centroid = [1, 0]; zero vector contributes cosine 0, other 1
    assert out["centroid_norm"] == pytest.approx(1.0)
    assert out["mean_cos"] == pytest.approx(0.5)


def test_hand_computed_centroid(spark):
    df = _df(spark, [(1, [1.0, 0.0], 7), (2, [0.0, 1.0], 7)])
    out = class_compactness(df).collect()[0]
    # centroid [0.5, 0.5]: norm sqrt(0.5), each member cos = 1/sqrt(2)
    assert out["centroid_norm"] == pytest.approx(math.sqrt(0.5), abs=1e-6)
    assert out["mean_cos"] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
