"""k-means: assignment matches numpy, one Lloyd step matches numpy,
fit converges to the true blob means, and trained centroids plug into
the IVF index."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_update_table,
)

DIM = 8


def _blobs(n_per=30, seed=3):
    rng = np.random.default_rng(seed)
    means = np.array(
        [[5.0] * DIM, [-5.0] * DIM, [5.0] * 4 + [-5.0] * 4]
    )
    pts = np.vstack(
        [m + 0.1 * rng.normal(size=(n_per, DIM)) for m in means]
    )
    return means, pts


@pytest.fixture(scope="module")
def blob_df(spark):
    _, pts = _blobs()
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assign_matches_numpy(spark, blob_df):
    means, pts = _blobs()
    cents = [list(map(float, m)) for m in means]
    got = {
        r.vec_id: r.cluster for r in kmeans_assign(blob_df, cents).collect()
    }
    d = ((pts[:, None, :] - means[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert all(got[i] == want[i] for i in range(len(pts)))


def test_update_step_matches_numpy(spark, blob_df):
    means, pts = _blobs()
    # deliberately offset init so the update actually moves
    cents = [list(map(float, m + 1.0)) for m in means]
    rows = kmeans_update_table(blob_df, cents).collect()
    # the DataFrame column is array<float>: round-trip the reference
    # values through float32 before comparing
    pts = pts.astype(np.float32).astype(np.float64)
    d = ((pts[:, None, :] - (means + 1.0)[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    for r in rows:
        members = pts[assign == r.cluster]
        assert r.n_members == len(members)
        assert r.mean == pytest.approx(members[:, r.pos].mean(), rel=1e-9)


def test_fit_recovers_blob_means(spark, blob_df):
    means, pts = _blobs()
    cents = kmeans_fit(
        blob_df, dim=DIM, n_clusters=3, n_iter=15, seed=1
    )
    got = np.asarray(cents)
    # every true mean has a fitted centroid within the blob radius
    for m in means:
        dist = np.abs(got - m[None, :]).max(axis=1).min()
        assert dist < 0.5, (m, got)


def test_fit_deterministic(spark, blob_df):
    c1 = kmeans_fit(blob_df, dim=DIM, n_clusters=3, n_iter=5, seed=9)
    c2 = kmeans_fit(blob_df, dim=DIM, n_clusters=3, n_iter=5, seed=9)
    assert c1 == c2


def test_trained_centroids_plug_into_ivf(spark, blob_df):
    """kmeans_fit output is a drop-in coarse quantizer: IVF with
    trained centroids and 1 probe cell returns same-blob neighbors."""
    from computer_vision_foundations_spark.operators.similarity import (
        ivf_flat_knn,
    )

    cents = kmeans_fit(blob_df, dim=DIM, n_clusters=3, n_iter=10, seed=1)
    probes = blob_df.filter(F.col("vec_id") == 0)  # blob 0 member
    out = ivf_flat_knn(
        blob_df, probes, dim=DIM, k=5, n_cells=3, n_probe_cells=1,
        centroids=cents,
    ).collect()
    assert len(out) == 5
    # blob 0 is rows 0..29; all neighbors must come from it
    assert all(r.neighbor_id < 30 for r in out)
