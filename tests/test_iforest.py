"""Isolation forest (operators/iforest)."""

import pytest

from computer_vision_foundations_spark.operators.iforest import (
    iforest_fit,
    isolation_scores,
    random_cut_trees,
)


def _walk(tree, p):
    depth = 0
    while "depth" not in tree:
        tree = tree["lo"] if p[tree["dim"]] < tree["thr"] else tree["hi"]
        depth += 1
    return tree["depth"]


def test_random_cut_trees_deterministic_and_bounded():
    a = random_cut_trees(4, n_trees=3, max_depth=5, seed=9)
    b = random_cut_trees(4, n_trees=3, max_depth=5, seed=9)
    assert a == b
    c = random_cut_trees(4, n_trees=3, max_depth=5, seed=10)
    assert a != c

    def max_depth(t, d=0):
        if "depth" in t:
            return t["depth"]
        return max(max_depth(t["lo"]), max_depth(t["hi"]))

    assert all(max_depth(t) <= 5 for t in a)


def test_scores_match_python_walk(spark):
    trees = random_cut_trees(3, n_trees=4, max_depth=4, seed=1, bounds=(-1, 1))
    pts = [(0, [0.1, -0.2, 0.3]), (1, [0.9, 0.9, -0.9]), (2, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = {r["id"]: r["avg_path"] for r in isolation_scores(df, trees).collect()}
    for i, p in pts:
        want = sum(_walk(t, p) for t in trees) / len(trees)
        assert got[i] == pytest.approx(want, abs=1e-6)


def test_fitted_forest_isolates_planted_outlier(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 0.1) for _ in range(8)]) for i in range(200)
    ]
    rows.append((999, [3.0] * 8))  # far-off outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    trees = iforest_fit(df, n_trees=16, sample_size=64, max_depth=8, seed=5)
    scored = {
        r["id"]: r["score"]
        for r in isolation_scores(df, trees).collect()
    }
    inlier_max = max(v for k, v in scored.items() if k != 999)
    assert scored[999] > inlier_max  # the outlier out-scores everyone


def test_fit_is_deterministic(spark):
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t1 = iforest_fit(df, n_trees=4, sample_size=16, max_depth=5, seed=2)
    t2 = iforest_fit(df, n_trees=4, sample_size=16, max_depth=5, seed=2)
    assert t1 == t2
