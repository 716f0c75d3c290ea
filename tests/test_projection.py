"""JL random projection + distributed PCA (operators/projection.py):
determinism, geometry preservation, covariance correctness vs numpy,
and eigensolve properties of the fitted model."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.projection import (
    covariance_matrix,
    jl_sign_matrix,
    pca_fit,
    pca_project,
    random_projection,
)


def _emb_df(spark, n=60, d=16, seed=0):
    rng = np.random.default_rng(seed)
    # anisotropic data so PCA has a meaningful spectrum
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales
    x = x @ basis
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        np.array(
            [np.array(r, dtype=np.float32) for r in (x.astype(np.float32))],
            dtype=np.float64,
        ),
    )


def test_jl_sign_matrix_deterministic_and_scaled():
    m1 = jl_sign_matrix(16, 4, 42)
    m2 = jl_sign_matrix(16, 4, 42)
    assert m1 == m2
    flat = [abs(x) for row in m1 for x in row]
    assert all(v == pytest.approx(0.5) for v in flat)  # 1/sqrt(4)
    assert jl_sign_matrix(16, 4, 43) != m1


def test_random_projection_matches_numpy(spark):
    df, x = _emb_df(spark)
    out = random_projection(df, out_dim=4, seed=7, decimals=None).collect()
    r = np.array(jl_sign_matrix(x.shape[1], 4, 7))
    for row in out:
        expect = r @ x[row["vec_id"]]
        assert np.allclose(row["projected"], expect, atol=1e-9)


def test_random_projection_preserves_distances_statistically(spark):
    df, x = _emb_df(spark, n=40, d=64)
    out = {
        r["vec_id"]: np.array(r["projected"])
        for r in random_projection(df, out_dim=32, seed=3, decimals=None).collect()
    }
    # JL with k=32: squared-distance ratios concentrate around 1
    rng = np.random.default_rng(1)
    ratios = []
    for _ in range(100):
        i, j = rng.choice(len(x), 2, replace=False)
        d_orig = np.sum((x[i] - x[j]) ** 2)
        d_proj = np.sum((out[i] - out[j]) ** 2)
        ratios.append(d_proj / d_orig)
    assert 0.75 < float(np.median(ratios)) < 1.25


def test_covariance_matches_numpy(spark):
    df, x = _emb_df(spark, n=50, d=8)
    rows = covariance_matrix(df, decimals=None).collect()
    got = np.zeros((8, 8))
    for r in rows:
        got[r["i"], r["j"]] = r["cov"]
    expect = np.cov(x, rowvar=False, bias=True)  # population
    assert np.allclose(got, expect, atol=1e-9)


def test_covariance_partition_invariant(spark):
    df, _ = _emb_df(spark, n=50, d=8)
    a = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(df).collect()}
    b = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df.repartition(7)).collect()
    }
    assert a == b  # rounded to 6: summation-order noise is below that


def test_pca_fit_properties(spark):
    df, x = _emb_df(spark, n=80, d=12)
    model = pca_fit(df, n_components=5)
    comps = np.array(model["components"])
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-8)
    # variance sorted descending and matches numpy's top eigenvalues
    ev = np.array(model["explained_variance"])
    assert np.all(np.diff(ev) <= 1e-12)
    expect = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True)))[::-1][:5]
    assert np.allclose(ev, expect, atol=1e-6)
    # mean matches
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)


def test_pca_project_reconstruction_improves_with_rank(spark):
    df, x = _emb_df(spark, n=80, d=12)
    mu = x.mean(axis=0)
    total = float(np.sum((x - mu) ** 2))
    errs = []
    for k in (2, 6, 12):
        model = pca_fit(df, n_components=k)
        comps = np.array(model["components"])
        proj = {
            r["vec_id"]: np.array(r["pca"])
            for r in pca_project(df, model, decimals=None).collect()
        }
        recon_err = 0.0
        for i in range(len(x)):
            recon = mu + proj[i] @ comps
            recon_err += float(np.sum((x[i] - recon) ** 2))
        errs.append(recon_err)
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] / total < 1e-9  # full rank reconstructs exactly


def test_pca_sign_canonical(spark):
    df, _ = _emb_df(spark, n=40, d=6)
    m1 = pca_fit(df, n_components=3)
    m2 = pca_fit(df.repartition(5), n_components=3)
    assert np.allclose(m1["components"], m2["components"], atol=1e-8)


def test_random_projection_empty_df_clear_error(spark):
    import pytest

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="pass dim"):
        random_projection(df, out_dim=4, seed=1)
    # explicit dim keeps it lazy and returns an empty frame
    out = random_projection(df, out_dim=4, seed=1, dim=8)
    assert out.count() == 0
