"""Seeded resampling (operators/resample) + F-S linkage
(operators/linkage)."""

import math

import pytest

from computer_vision_foundations_spark.operators.linkage import (
    fs_link_scores,
)
from computer_vision_foundations_spark.operators.resample import (
    laplace_noisy_counts,
    poisson_bootstrap_ci,
)
from pyspark.sql import functions as F


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    import random

    rng = random.Random(1)
    rows = [(i, "k", rng.gauss(10, 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = poisson_bootstrap_ci(
        df, "value", "event_id", "event_type", n_replicas=80
    ).collect()[0]
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    # CI width for n=400, sd 2: ~4*2/sqrt(400)=0.4; allow slack
    assert (r["ci_hi"] - r["ci_lo"]) < 1.0
    # small sample → wider CI
    small = spark.createDataFrame(rows[:25], "event_id long, event_type string, value double")
    r2 = poisson_bootstrap_ci(
        small, "value", "event_id", "event_type", n_replicas=80
    ).collect()[0]
    assert (r2["ci_hi"] - r2["ci_lo"]) > (r["ci_hi"] - r["ci_lo"])


def test_bootstrap_is_seed_deterministic(spark):
    rows = [(i, "k", float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    a = poisson_bootstrap_ci(df, "value", "event_id", "event_type", seed=3).collect()
    b = poisson_bootstrap_ci(df, "value", "event_id", "event_type", seed=3).collect()
    c = poisson_bootstrap_ci(df, "value", "event_id", "event_type", seed=4).collect()
    assert a == b
    assert a != c


def test_laplace_noise_centered_and_scaled(spark):
    # many groups: empirical noise mean ~0, scale grows as 1/eps
    rows = [(f"g{i}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "event_type string")
    for eps, max_mean, min_spread in ((1.0, 0.15, 0.5), (0.2, 0.8, 2.5)):
        got = laplace_noisy_counts(df, "event_type", epsilon=eps).collect()
        noises = [r["noisy_n"] - r["n"] for r in got]
        mean = sum(noises) / len(noises)
        mad = sum(abs(x) for x in noises) / len(noises)
        assert abs(mean) < max_mean
        # E|Laplace(b)| = b = 1/eps
        assert mad == pytest.approx(1.0 / eps, rel=0.25)
        assert mad > min_spread * 0.0  # placeholder ordering below
    # larger eps → smaller noise
    g1 = laplace_noisy_counts(df, "event_type", epsilon=1.0).collect()
    g2 = laplace_noisy_counts(df, "event_type", epsilon=0.2).collect()
    mad1 = sum(abs(r["noisy_n"] - r["n"]) for r in g1) / len(g1)
    mad2 = sum(abs(r["noisy_n"] - r["n"]) for r in g2) / len(g2)
    assert mad2 > mad1


def test_fs_linkage_weights_and_decisions(spark):
    records = spark.createDataFrame(
        [
            (1, "acme", 10, 100.0),
            (2, "acme", 10, 150.0),   # agrees on all three vs 1
            (3, "acme", 20, 900.0),   # name only vs 1
        ],
        "id long, name string, nation long, bal double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    fields = [
        (F.col("name_a") == F.col("name_b"), 0.9, 0.01, "name"),
        (F.col("nation_a") == F.col("nation_b"), 0.8, 0.1, "nation"),
        (
            F.abs(F.col("bal_a") - F.col("bal_b")) <= 100,
            0.7,
            0.05,
            "bal",
        ),
    ]
    got = {
        (r["id_a"], r["id_b"]): r
        for r in fs_link_scores(
            pairs, records, "id", fields, match_threshold=8.0
        ).collect()
    }
    w_all = (
        math.log2(0.9 / 0.01) + math.log2(0.8 / 0.1) + math.log2(0.7 / 0.05)
    )
    w_name_only = (
        math.log2(0.9 / 0.01)
        + math.log2(0.2 / 0.9)
        + math.log2(0.3 / 0.95)
    )
    assert got[(1, 2)]["weight"] == pytest.approx(w_all, abs=1e-6)
    assert got[(1, 3)]["weight"] == pytest.approx(w_name_only, abs=1e-6)
    assert got[(1, 2)]["decision"] == "match"
    assert got[(1, 3)]["decision"] != "match"
