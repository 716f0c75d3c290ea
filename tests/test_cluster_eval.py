"""Cluster-quality metrics (operators/cluster_eval)."""

import math

import pytest

from computer_vision_foundations_spark.operators.cluster_eval import (
    davies_bouldin,
    simplified_silhouette,
)

# two well-separated 2-d blobs around (0,0) and (10,0)
CENTROIDS = [[0.0, 0.0], [10.0, 0.0]]
POINTS = [
    (0, [0.1, 0.0]),
    (1, [-0.1, 0.0]),
    (2, [0.0, 0.2]),
    (3, [10.1, 0.0]),
    (4, [9.9, 0.1]),
]


def _dist(p, c):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(p, c)))


def test_silhouette_well_separated_blobs(spark):
    df = spark.createDataFrame(POINTS, "vec_id long, embedding array<double>")
    got = {
        r["cluster"]: r
        for r in simplified_silhouette(df, CENTROIDS, "embedding").collect()
    }
    assert got[0]["n"] == 3 and got[1]["n"] == 2
    # hand-compute mean s per cluster
    for cid, members in ((0, POINTS[:3]), (1, POINTS[3:])):
        ss = []
        for _, p in members:
            a = _dist(p, CENTROIDS[cid])
            b = _dist(p, CENTROIDS[1 - cid])
            ss.append((b - a) / max(a, b))
        assert got[cid]["mean_silhouette"] == pytest.approx(
            sum(ss) / len(ss), abs=1e-6
        )
    # tight, far-apart blobs → silhouette near 1
    assert all(v["mean_silhouette"] > 0.9 for v in got.values())


def test_silhouette_assignment_is_argmin(spark):
    # a point nearer centroid 1 must be counted there
    df = spark.createDataFrame(
        [(0, [9.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = simplified_silhouette(df, CENTROIDS, "embedding").collect()
    assert len(got) == 1 and got[0]["cluster"] == 1


def test_davies_bouldin_hand_computation(spark):
    df = spark.createDataFrame(POINTS, "vec_id long, embedding array<double>")
    got = {
        r["cluster"]: r
        for r in davies_bouldin(df, CENTROIDS, "embedding").collect()
    }
    s0 = sum(_dist(p, CENTROIDS[0]) for _, p in POINTS[:3]) / 3
    s1 = sum(_dist(p, CENTROIDS[1]) for _, p in POINTS[3:]) / 2
    m = 10.0
    r_expected = (s0 + s1) / m
    assert got[0]["scatter"] == pytest.approx(s0, abs=1e-6)
    assert got[1]["scatter"] == pytest.approx(s1, abs=1e-6)
    assert got[0]["r"] == pytest.approx(r_expected, abs=1e-6)
    assert got[1]["r"] == pytest.approx(r_expected, abs=1e-6)
    # compact well-separated clusters → DB index << 1
    assert (got[0]["r"] + got[1]["r"]) / 2 < 0.1


def test_empty_cluster_absent_not_zero(spark):
    # all points near centroid 0: cluster 1 must not appear
    df = spark.createDataFrame(POINTS[:3], "vec_id long, embedding array<double>")
    sil = simplified_silhouette(df, CENTROIDS, "embedding").collect()
    assert [r["cluster"] for r in sil] == [0]
    db = davies_bouldin(df, CENTROIDS, "embedding").collect()
    # no other non-empty cluster → r is NULL
    assert len(db) == 1 and db[0]["r"] is None
