"""Similarity-search operators (SURVEY §2.10)."""

from computer_vision_foundations_spark.operators.similarity import (
    brute_force_knn,
    lsh_bucketed_knn,
)


def _corpus(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 0.0, 0.0, 0.001]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_knn_ranks(spark):
    corpus = _corpus(spark)
    probes = corpus.filter("vec_id = 0")
    out = brute_force_knn(corpus, probes, k=2).collect()
    assert [r.neighbor_id for r in out] == [4, 1]
    assert out[0].rank == 1 and out[0].cos_sim > 0.999


def test_brute_force_excludes_self(spark):
    corpus = _corpus(spark)
    out = brute_force_knn(corpus, corpus, k=10).collect()
    assert all(r.probe_id != r.neighbor_id for r in out)


def test_lsh_bucketed_finds_near_identical(spark):
    corpus = _corpus(spark)
    probes = corpus.filter("vec_id = 0")
    out = lsh_bucketed_knn(corpus, probes, dim=4, k=2, n_planes=4, n_tables=3)
    neighbors = [r.neighbor_id for r in out.collect()]
    # vector 4 is near-identical to the probe: same side of every
    # hyperplane with overwhelming probability across 3 tables
    assert 4 in neighbors


def test_ivf_flat_knn_recall_and_shape(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        ivf_flat_knn,
    )

    corpus = _corpus(spark)
    probes = corpus.filter("vec_id = 0")
    # One probe cell out of two: the near-identical vector 4 lands in
    # the probe's own cell (same direction ⇒ same nearest centroid).
    out = ivf_flat_knn(
        corpus, probes, dim=4, k=3, n_cells=2, n_probe_cells=1, seed=7
    ).collect()
    assert all(r.probe_id == 0 and r.neighbor_id != 0 for r in out)
    assert 4 in [r.neighbor_id for r in out]
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks) and ranks[0] == 1


def test_ivf_probe_all_cells_matches_brute_force(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        ivf_flat_knn,
    )

    corpus = _corpus(spark)
    probes = corpus.filter("vec_id <= 1")
    exact = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in brute_force_knn(corpus, probes, k=3).collect()
    }
    # n_probe_cells == n_cells ⇒ every candidate scored ⇒ exact result.
    approx = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in ivf_flat_knn(
            corpus, probes, dim=4, k=3, n_cells=3, n_probe_cells=3, seed=7
        ).collect()
    }
    assert approx == exact
