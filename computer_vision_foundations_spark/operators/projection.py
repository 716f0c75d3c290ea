"""Dimensionality reduction over embedding columns: JL random
projection and distributed PCA.

Random projection (Johnson–Lindenstrauss): a seeded ±1 sign matrix
(Achlioptas 2001 — database-friendly random projections) generated
once on the driver and embedded in the plan as literals, exactly like
the LSH hyperplanes / PQ codebooks elsewhere in this repo. The
projection itself is the JVM HOF fold from `functions/vectors.py`
(whole-stage codegen; no Python in the hot path), so the corpus is one
narrow projection — no shuffle at all, and a SQL oracle can replay the
same literals.

Distributed PCA: the classic two-stage shape for tall-skinny data —
(1) per-partition partial Gramian + sum vector via one Arrow-batched
`mapInPandas` (d×d doubles per PARTITION, not per row), (2) a hash
aggregate over (i, j) cells — d² rows total, model-sized — and (3) a
driver-side `numpy.linalg.eigh` on the d×d covariance (the same
"model-sized driver state" rule as k-means centroids in
`operators/clustering.py`). The 100 TB story: the corpus is read once,
nothing data-sized shuffles or collects; only d² partial sums move.
Eigenvector signs are canonicalized (largest-|entry| positive) so
results are deterministic across BLAS builds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "jl_sign_matrix",
    "random_projection",
    "covariance_matrix",
    "cross_gramian",
    "procrustes_fit",
    "pca_fit",
    "pca_project",
]


def jl_sign_matrix(dim: int, out_dim: int, seed: int) -> list[list[float]]:
    """Deterministic ±1/√out_dim matrix ``[out_dim][dim]`` — entry
    (j, i) is the parity of one md5 byte of ``{seed}:{j}:{i}``, so any
    engine (the SQL oracle included) can re-derive it bit-for-bit."""
    scale = 1.0 / float(np.sqrt(out_dim))
    return [
        [
            (
                scale
                if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
                else -scale
            )
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 42,
    out_col: str = "projected",
    decimals: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Append a JL-projected ``array<double>`` column. One narrow
    codegen projection; the sign matrix rides the plan as literals.
    Pass ``dim`` explicitly to stay fully lazy — otherwise it is
    inferred from the first row (one small eager job; raises a clear
    error on an empty frame or NULL leading vector)."""
    if dim is None:
        row = df.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError(
                f"cannot infer vector dim from empty/NULL '{vec_col}'; "
                "pass dim= explicitly"
            )
        dim = len(row[0])
    rows = jl_sign_matrix(dim, out_dim, seed)
    comps = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in rows]
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    proj = F.transform(
        comps,
        lambda row: F.aggregate(
            F.zip_with(v, row, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if decimals is not None:
        proj = F.transform(proj, lambda x: F.round(x, decimals))
    return df.withColumn(out_col, proj)


# Fixed-point grid for the exact Gramian: components are quantized to
# 1e-6 (floor(x*1e6 + 0.5), i.e. round-half-up — the one rounding rule
# numpy, Spark SQL and DuckDB all express identically), accumulated in
# int64 per partition, and summed across partitions as DECIMAL(38,0).
# Integer addition is associative, so the reduction is PARTITION-ORDER
# FREE — the driver-hash flake class (float sum → round boundary flip)
# is structurally impossible. Overflow headroom: |q| ≤ |x|·1e6, so for
# unit-scale embeddings a per-partition int64 Σq_i·q_j stays exact up
# to ~9e6 rows/partition per unit of |x|² — far above any sane
# maxPartitionBytes split; the cross-partition DECIMAL(38,0) sum has
# 1e38 headroom.
_GRAM_SCALE = 1_000_000


_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("sxy", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _partial_gramian(vec_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sums = None
        count = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q = np.floor(x * float(_GRAM_SCALE) + 0.5).astype(np.int64)
            g = q.T @ q  # int64 matmul: exact, order-free
            gram = g if gram is None else gram + g
            s = q.sum(axis=0)
            sums = s if sums is None else sums + s
            count += len(pdf)
        if gram is None:
            return
        d = gram.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int32),
                "j": jj.ravel().astype(np.int32),
                "sxy": gram.ravel(),
                # the sum vector rides the diagonal rows to avoid a
                # second pass; n likewise
                "sx": np.where(
                    ii.ravel() == jj.ravel(),
                    sums[ii.ravel()],
                    np.int64(0),
                ),
                "n": np.full(d * d, count, dtype=np.int64),
            }
        )

    return fn


def _gramian_totals(df: DataFrame, vec_col: str) -> DataFrame:
    """ONE corpus scan → (i, j, sxy, sx_diag, n) for every dimension
    pair: Σx_i·x_j, the per-dimension sums (on diagonal rows), and the
    total row count. d² rows, localCheckpoint'd so the two consumers
    (cov cells + means) never re-scan the data.

    Storage note (the components.py concern): the checkpointed blocks
    are d² rows ≈ tens of KB — unlike the edge/label tables there,
    holding them until ContextCleaner GC is negligible, so no explicit
    release handle is threaded through to callers."""
    parts = df.select(vec_col).mapInPandas(
        _partial_gramian(vec_col), schema=_GRAM_SCHEMA
    )
    dec = T.DecimalType(38, 0)
    return (
        parts.groupBy("i", "j")
        .agg(
            F.sum(F.col("sxy").cast(dec)).alias("sxy"),
            F.sum(F.col("sx").cast(dec)).alias("sx_diag"),
            F.sum("n").alias("n"),
        )
        .localCheckpoint()
    )


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", decimals: int | None = 6
) -> DataFrame:
    """(i, j, cov) rows of the population covariance of an
    ``array<float>`` column — the distributed stage of PCA, exposed
    relationally so it differential-checks against a SQL oracle.
    cov(i,j) = E[x_i x_j] − E[x_i]·E[x_j] on the 1e-6 fixed-point grid
    (see ``_GRAM_SCALE``): the sums are exact integers, so the result
    is identical under ANY partitioning — no float-reduction-order
    flake. Exactly one pass over the corpus; everything after the
    Gramian aggregate is d²-row algebra (means join is a d-row
    broadcast). The float ops (two divides, one multiply, one round)
    run on exact-integer inputs in a fixed expression order, so any
    IEEE-754 engine reproduces them bit-for-bit."""
    tot = _gramian_totals(df, vec_col)
    means = tot.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("mi"),
        (
            F.col("sx_diag").cast("double")
            / F.col("n").cast("double")
            / F.lit(float(_GRAM_SCALE))
        ).alias("mean"),
    )
    cov = (
        tot.join(
            F.broadcast(
                means.withColumnRenamed("mi", "i").withColumnRenamed(
                    "mean", "mean_i"
                )
            ),
            "i",
        )
        .join(
            F.broadcast(
                means.withColumnRenamed("mi", "j").withColumnRenamed(
                    "mean", "mean_j"
                )
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("sxy").cast("double")
                / F.col("n").cast("double")
                / F.lit(float(_GRAM_SCALE) * float(_GRAM_SCALE))
                - F.col("mean_i") * F.col("mean_j")
            ).alias("cov"),
        )
    )
    if decimals is not None:
        # + 0.0 normalizes IEEE negative zero: DuckDB's round() can emit
        # -0.0 where Spark emits +0.0 (equal under ==, different under the
        # driver's byte-level value hash — the r5/r6 q09 red). Exact no-op
        # for every other double.
        cov = cov.withColumn("cov", F.round("cov", decimals) + F.lit(0.0))
    return cov


_XGRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("sxy", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _partial_cross(x_col: str, y_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        count = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[x_col]])
            y = np.array([np.asarray(v, dtype=np.float64) for v in pdf[y_col]])
            qx = np.floor(x * float(_GRAM_SCALE) + 0.5).astype(np.int64)
            qy = np.floor(y * float(_GRAM_SCALE) + 0.5).astype(np.int64)
            g = qx.T @ qy  # (dx, dy) int64 — exact, order-free
            gram = g if gram is None else gram + g
            count += len(pdf)
        if gram is None:
            return
        dx, dy = gram.shape
        ii, jj = np.meshgrid(np.arange(dx), np.arange(dy), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int32),
                "j": jj.ravel().astype(np.int32),
                "sxy": gram.ravel(),
                "n": np.full(dx * dy, count, dtype=np.int64),
            }
        )

    return fn


def cross_gramian(
    df: DataFrame,
    x_col: str,
    y_col: str,
    decimals: int | None = 6,
) -> DataFrame:
    """``(i, j, m)`` rows of M = (1/n)·Σ x·yᵀ between two vector
    columns — the distributed stage of orthogonal Procrustes alignment
    (Schönemann 1966): aligning two embedding SPACES (a re-trained
    encoder, a projected index vs its source) needs only this dx×dy
    moment matrix; the rotation itself is a model-sized driver SVD
    (:func:`procrustes_fit`). Same exact fixed-point reduction as
    :func:`covariance_matrix` — 1e-6 grid, int64 per partition,
    DECIMAL(38,0) across partitions — so the result is identical under
    any partitioning, and a SQL oracle replays it as integer sums.
    One corpus pass; only dx·dy cells ever shuffle."""
    parts = df.select(x_col, y_col).mapInPandas(
        _partial_cross(x_col, y_col), schema=_XGRAM_SCHEMA
    )
    dec = T.DecimalType(38, 0)
    tot = parts.groupBy("i", "j").agg(
        F.sum(F.col("sxy").cast(dec)).alias("sxy"),
        F.sum("n").alias("n"),
    )
    m = (
        F.col("sxy").cast("double")
        / F.col("n").cast("double")
        / F.lit(float(_GRAM_SCALE) * float(_GRAM_SCALE))
    )
    out = tot.select("i", "j", m.alias("m"))
    if decimals is not None:
        out = out.withColumn("m", F.round("m", decimals))
    return out


def procrustes_fit(
    df: DataFrame, x_col: str, y_col: str
) -> dict:
    """Orthogonal Procrustes: the rotation Ω = U·Vᵀ (from the SVD of
    the cross-Gramian M = Σ x·yᵀ) minimizing ‖XΩ − Y‖_F over
    orthogonal Ω. Distributed work is ONE exact cross-Gramian pass;
    the SVD is dx×dy driver-side (model-sized, like the PCA
    eigensolve). Returns {'rotation': [dx][dy], 'singular_values':
    [...]} with sign-canonicalized factors so results are
    deterministic across BLAS builds."""
    rows = cross_gramian(df, x_col, y_col, decimals=None).collect()
    dx = max(r["i"] for r in rows) + 1
    dy = max(r["j"] for r in rows) + 1
    m = np.zeros((dx, dy))
    for r in rows:
        m[r["i"], r["j"]] = float(r["m"])
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    # canonical signs: largest-|entry| of each left vector positive
    for k in range(u.shape[1]):
        if u[np.argmax(np.abs(u[:, k])), k] < 0:
            u[:, k] = -u[:, k]
            vt[k] = -vt[k]
    omega = u @ vt
    return {
        "rotation": omega.tolist(),
        "singular_values": s.tolist(),
    }


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", n_components: int = 8
) -> dict:
    """Fit PCA: ONE distributed Gramian pass (see `_gramian_totals`) +
    driver-side eigh on the d×d matrix (model-sized collect, the only
    one — covariance, means, and count all come from the same d² rows).
    Returns {'mean': [d], 'components': [n_components][d],
    'explained_variance': [n_components]} with deterministic signs."""
    rows = _gramian_totals(df, vec_col).collect()
    d = max(r["i"] for r in rows) + 1
    n_total = rows[0]["n"]
    scale2 = float(_GRAM_SCALE) * float(_GRAM_SCALE)
    sxy = np.zeros((d, d))
    mu = np.zeros(d)
    for r in rows:
        sxy[r["i"], r["j"]] = float(r["sxy"]) / scale2
        if r["i"] == r["j"]:
            mu[r["i"]] = float(r["sx_diag"]) / n_total / float(_GRAM_SCALE)
    cov = sxy / n_total - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # symmetrize float noise
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (n_components, d)
    for k in range(comps.shape[0]):  # canonical sign
        if comps[k, np.argmax(np.abs(comps[k]))] < 0:
            comps[k] = -comps[k]
    return {
        "mean": mu.tolist(),
        "components": comps.tolist(),
        "explained_variance": evals[order].tolist(),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    decimals: int | None = 6,
) -> DataFrame:
    """Project onto fitted components: y_k = (v − μ)·c_k as a JVM HOF
    fold over literal components — same narrow no-shuffle shape as
    `random_projection`."""
    mean = F.array(*[F.lit(float(m)) for m in model["mean"]])
    comps = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in row])
            for row in model["components"]
        ]
    )
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mean,
        lambda a, b: a - b,
    )
    proj = F.transform(
        comps,
        lambda row: F.aggregate(
            F.zip_with(centered, row, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if decimals is not None:
        proj = F.transform(proj, lambda x: F.round(x, decimals))
    return df.withColumn(out_col, proj)
