"""Grid-blocked DBSCAN (operators/dbscan)."""

from computer_vision_foundations_spark.operators.dbscan import dbscan


def _run(spark, pts, eps, min_pts, block_dims=(0, 1)):
    rows = [(i, [float(x) for x in v]) for i, v in pts]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in dbscan(
            df, eps=eps, min_pts=min_pts, block_dims=block_dims
        ).collect()
    }


def test_two_blobs_and_noise(spark):
    blob1 = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)]
    blob2 = [(10 + i, [5.0 + 0.01 * i, 5.0]) for i in range(5)]
    outlier = [(99, [2.5, -2.5])]
    out = _run(spark, blob1 + blob2 + outlier, eps=0.5, min_pts=3)
    assert out[99] == ("noise", -1)
    c1 = {out[i][1] for i in range(5)}
    c2 = {out[10 + i][1] for i in range(5)}
    assert c1 == {0} and c2 == {10}
    assert all(out[i][0] == "core" for i in range(5))


def test_border_point_attaches_to_cluster(spark):
    # dense core at x=0..0.2, border at 0.6 (within eps of one core
    # point but with only 2 neighbors itself)
    core = [(i, [0.1 * i, 0.0]) for i in range(3)]
    border = [(50, [0.6, 0.0])]
    far = [(60, [10.0, 0.0])]
    out = _run(spark, core + border + far, eps=0.45, min_pts=3)
    assert out[50] == ("border", 0)
    assert out[60] == ("noise", -1)


def test_chain_connects_through_cores(spark):
    # a chain of core points density-connects into ONE cluster even
    # though the endpoints are far apart
    chain = [(i, [0.4 * i, 0.0]) for i in range(10)]
    out = _run(spark, chain, eps=0.9, min_pts=3)
    clusters = {c for _, c in out.values()}
    assert clusters == {0}


def test_pairs_across_cell_boundary_found(spark):
    # two points straddling a grid boundary at distance < eps: the
    # adjacent-cell replication must still find the pair
    pts = [(1, [0.99, 0.0]), (2, [1.01, 0.0]), (3, [1.0, 0.05])]
    out = _run(spark, pts, eps=1.0, min_pts=3)
    assert all(role == "core" for role, _ in out.values())
    assert {c for _, c in out.values()} == {1}


def test_isolated_core_cluster_is_own_id(spark):
    # min_pts=1: every point is core; the isolated one clusters alone
    pts = [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (9, [50.0, 0.0])]
    out = _run(spark, pts, eps=0.5, min_pts=1)
    assert out[9] == ("core", 9)
    assert out[1] == ("core", 1) and out[2] == ("core", 1)


def test_blas_pair_path_equals_join_path(spark):
    """The cogrouped matmul prefilter + exact re-check emits exactly
    the join path's pair set (the matmul is never the decider)."""
    import random

    from computer_vision_foundations_spark.operators.dbscan import (
        _eps_pairs,
        _eps_pairs_blas,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for eps in (0.6, 1.1):
        a = set(
            map(tuple, _eps_pairs(df, "embedding", "vec_id", eps, (0, 1)).collect())
        )
        b = set(
            map(
                tuple,
                _eps_pairs_blas(df, "embedding", "vec_id", eps, (0, 1)).collect(),
            )
        )
        assert a == b and a
