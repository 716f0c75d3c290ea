"""LOF: the planted outlier wins, inliers stay near 1."""

from computer_vision_foundations_spark.operators.lof import lof_scores


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        ["vec_id", "embedding", "label"],
    )


def test_planted_outlier_ranks_first(spark):
    # a tight cluster around (1, 0, ...) plus one vector pointing
    # nearly orthogonal — cosine-isolated, so its neighborhood is far
    # sparser than its neighbors'
    base = [
        [1.0, 0.001 * i, 0.0, 0.0] for i in range(12)
    ]
    outlier = [0.05, 1.0, 0.0, 0.0]
    out = lof_scores(_df(spark, base + [outlier]), k=3, top=13).collect()
    assert out[0].vec_id == 12
    assert out[0].lof > 1.5
    # cluster members sit in uniform density → LOF ≈ 1
    rest = [r.lof for r in out if r.vec_id != 12]
    assert all(0.5 <= v <= 1.5 for v in rest)


def test_blocking_limits_neighbors(spark):
    # two labels → pairs never cross blocks; every point still scored
    df = spark.createDataFrame(
        [(i, [1.0, float(i % 4)], i % 2) for i in range(10)],
        ["vec_id", "embedding", "label"],
    )
    out = lof_scores(df, k=2, top=100).collect()
    assert len(out) == 10


def test_uniform_line_scores_near_one(spark):
    vecs = [[1.0, 0.01 * i] for i in range(10)]
    out = lof_scores(_df(spark, vecs), k=3, top=10).collect()
    assert all(0.7 <= r.lof <= 1.4 for r in out)
