"""Round-8 operators: Hill tail index, embedding isotropy,
t-closeness — hand-computed semantics (the differential gate covers
cross-engine exactness; these pin the math itself)."""

import math

import pytest

from computer_vision_foundations_spark.operators.embedding_stats import (
    embedding_isotropy,
)
from computer_vision_foundations_spark.operators.privacy import (
    t_closeness_report,
)
from computer_vision_foundations_spark.operators.zipf import hill_tail_index


def test_hill_matches_hand_computation(spark):
    # corpus engineered so token counts are known: token "t{i}" appears
    # c_i times; k=3 -> top counts 16,8,4 with threshold X(4)=2
    counts = {"a": 16, "b": 8, "c": 4, "d": 2, "e": 1}
    text = " ".join(tok for tok, c in counts.items() for tok in [tok] * c)
    df = spark.createDataFrame([(text,)], "text string")
    row = hill_tail_index(df, "text", k=3).first()
    h = (math.log(16 / 2) + math.log(8 / 2) + math.log(4 / 2)) / 3
    assert row["k_used"] == 3
    assert row["hill_h"] == pytest.approx(h, abs=1e-6)
    assert row["tail_index"] == pytest.approx(1 / h, abs=1e-6)


def test_hill_fewer_tokens_than_k_reports_zero_used(spark):
    df = spark.createDataFrame([("a b a",)], "text string")
    # vocab=2 < k+1: no threshold row exists -> the single aggregate
    # row reports k_used=0 with NULL estimates (same on the oracle)
    row = hill_tail_index(df, "text", k=256).first()
    assert row["k_used"] == 0
    assert row["hill_h"] is None and row["tail_index"] is None


def test_isotropy_opposite_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0],), ([-1.0, 0.0],)], "embedding array<double>"
    )
    row = embedding_isotropy(df).first()
    assert row["n_vectors"] == 2
    assert row["avg_norm"] == pytest.approx(1.0, abs=1e-5)
    assert row["mean_dir_norm"] == pytest.approx(0.0, abs=1e-5)
    assert row["avg_pairwise_cos"] == pytest.approx(-1.0, abs=1e-5)


def test_isotropy_identical_vectors(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0],)] * 3, "embedding array<double>"
    )
    row = embedding_isotropy(df).first()
    assert row["n_vectors"] == 3
    assert row["avg_norm"] == pytest.approx(5.0, abs=1e-5)
    assert row["mean_dir_norm"] == pytest.approx(1.0, abs=1e-5)
    assert row["avg_pairwise_cos"] == pytest.approx(1.0, abs=1e-5)


def test_isotropy_skips_zero_vectors(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 0.0],), ([0.0, 1.0],)],
        "embedding array<double>",
    )
    row = embedding_isotropy(df).first()
    assert row["n_vectors"] == 2  # zero vector has no direction
    assert row["avg_pairwise_cos"] == pytest.approx(0.0, abs=1e-5)


def test_t_closeness_identical_class_is_zero(spark):
    # both classes have the SAME value distribution as the global one
    rows = [("A", float(v)) for v in (1, 2, 3, 4)] + [
        ("B", float(v)) for v in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "seg string, val double")
    out = {
        r["seg"]: r
        for r in t_closeness_report(
            df, ["seg"], "val", t=0.1, n_bins=8
        ).collect()
    }
    assert out["A"]["t_dist"] == 0.0 and out["A"]["t_close"]
    assert out["B"]["t_dist"] == 0.0 and out["B"]["t_close"]


def test_t_closeness_extreme_class_flagged(spark):
    # class B sits entirely at the maximum -> far from global
    rows = [("A", float(v)) for v in range(10)] + [("B", 9.0)] * 5
    df = spark.createDataFrame(rows, "seg string, val double")
    out = {
        r["seg"]: r
        for r in t_closeness_report(
            df, ["seg"], "val", t=0.1, n_bins=8
        ).collect()
    }
    assert out["B"]["t_dist"] > out["A"]["t_dist"]
    assert not out["B"]["t_close"]
    # EMD is bounded by 1 under the (n_bins-1) normalization
    assert 0.0 <= out["B"]["t_dist"] <= 1.0


def test_t_closeness_constant_sensitive_degenerates_empty(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("B", 1.0)], "seg string, val double"
    )
    # single support point: no gaps, no measurable distance
    assert t_closeness_report(df, ["seg"], "val").count() == 0


def test_kcenter_sequence_hand_case(spark):
    from computer_vision_foundations_spark.operators.coreset import (
        kcenter_coreset,
    )

    # 1-D points: ids 1..4 at 0, 1, 10, 100 -> seed id1(0); farthest
    # is id4(100); then id3(10, min dist to {0,100} = 100 in grid^2
    # units 1e12*100^2... verify sequence + exact d2)
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [100.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_coreset(df, k=3).collect()
    assert [(r["round"], r["vec_id"]) for r in rows] == [(1, 1), (2, 4), (3, 3)]
    g = 1_000_000
    assert rows[0]["d2"] is None
    assert rows[1]["d2"] == (100 * g) ** 2          # dist(4, 1)
    assert rows[2]["d2"] == (10 * g) ** 2           # min(dist(3,1), dist(3,4))


def test_t_closeness_null_and_separator_qi_classes_stay_distinct(spark):
    # round-9 advice fix: the class key must be INJECTIVE on the QI
    # tuple. concat_ws skips NULLs, so ('a', NULL) and (NULL, 'a')
    # collided into one class, and a QI value containing the
    # separator character merged distinct tuples. Each of the four
    # tuples below must stay its own equivalence class.
    rows = (
        [("a", None, 0.0)] * 4
        + [(None, "a", 9.0)] * 4
        + [("x\x1fy", "z", 0.0)] * 4
        + [("x", "y\x1fz", 9.0)] * 4
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, val double")
    out = t_closeness_report(df, ["q1", "q2"], "val", n_bins=8).collect()
    assert len(out) == 4  # no class merging
    assert all(r["class_size"] == 4 for r in out)
    # each class sits entirely at one extreme of a 50/50 global
    # split, so every class has the SAME (maximal) distance — a
    # merged class would average out to something smaller
    dists = {r["t_dist"] for r in out}
    assert len(dists) == 1 and dists.pop() > 0.0
