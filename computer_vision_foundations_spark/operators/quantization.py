"""Product quantization (PQ) over embedding columns.

The compression layer of warehouse-scale ANN (the FAISS IVF-PQ shape):
split a ``dim``-wide vector into ``n_subvectors`` contiguous
subvectors, assign each to its nearest centroid from a per-subvector
codebook, and store only the centroid ids — a 64-dim float vector
(256 B) becomes 8 small ints. At 100 TB this is the difference between
scanning vectors and scanning CODES: the candidate scan reads a few
bytes per row, vectors are fetched only for final reranking (if at
all).

Scoring uses the classic asymmetric distance computation (ADC): each
probe precomputes a lookup table of its distance to every codebook
centroid (``n_subvectors × n_centroids`` floats, one Arrow-batched
numpy pass per probe), and a candidate's approximate distance is just
``n_subvectors`` table lookups — no per-pair vector math at all. The
per-pair expression is a JVM-side fold over the code array; the corpus
side of the scan never touches a float vector.

Everything is seeded and the codebooks can be replayed as SQL
literals, so encode, LUT, and ADC scores are all differentially
checkable against DuckDB (same trick as the IVF/LSH oracles). Scores
drop the per-probe ``||p_sub||²`` constant (it cannot change
per-probe ranking), so both engines compute
``Σ_s (||c_s||² − 2·p_sub·c_s)`` — in the same ascending order, with
sequential f64 summation on both sides, making values hash-stable.

Like ``random_centroids``, the seeded gaussian codebooks stand in for
k-means-trained ones — at scale you'd train per-subvector codebooks on
a sample and pass them in; the index structure and the plans are
identical.

Composition at scale: ``ivf_flat_knn`` prunes to cells, ``pq_encode``
compresses what's scanned inside a cell, exact rerank (optionally) on
the survivors. Each stage is an independent operator here.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["pq_codebooks", "pq_encode", "pq_adc_topk"]


def pq_codebooks(
    dim: int, n_subvectors: int, n_centroids: int, seed: int
) -> list[list[list[float]]]:
    """Seeded gaussian codebooks ``[subvector][centroid][sub_dim]``."""
    assert dim % n_subvectors == 0, "n_subvectors must divide dim"
    sub_dim = dim // n_subvectors
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(sub_dim)] for _ in range(n_centroids)]
        for _ in range(n_subvectors)
    ]


def _seq_scores(sub: "np.ndarray", cb: "np.ndarray") -> "np.ndarray":
    """``||c||² − 2·v·c`` per (row, centroid), f64, with the dot
    accumulated SEQUENTIALLY over the sub-dimension (ascending index, a
    Python loop over sub_dim columns) — bit-identical to DuckDB's
    ``list_dot_product`` order, unlike numpy's pairwise ``dot``."""
    c_norm = (cb.astype(np.float64) ** 2).sum(axis=1)
    dot = np.zeros((sub.shape[0], cb.shape[0]), dtype=np.float64)
    for j in range(sub.shape[1]):
        dot += sub[:, j : j + 1] * cb[None, :, j]
    return c_norm[None, :] - 2.0 * dot


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "codes",
) -> DataFrame:
    """``(id, codes array<int>)`` — nearest-centroid code per
    subvector (first index on ties, matching the oracle's
    ``list_position(l, list_min(l))``). One narrow Arrow-batched
    projection; this is the representation you PERSIST at scale."""
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub_dim = cbs[0].shape[1]

    @pandas_udf("array<int>")
    def encode_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        codes = np.empty((len(mat), len(cbs)), dtype=np.int32)
        for s, cb in enumerate(cbs):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            codes[:, s] = _seq_scores(sub, cb).argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(
        F.col(id_col), encode_udf(F.col(vec_col)).alias(out_col)
    )


def pq_adc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k neighbors per probe by PQ asymmetric distance.

    Returns ``(probe_id, neighbor_id, adc_score, rank)`` — adc_score =
    ``Σ_s (||c||² − 2·p_sub·c_code)`` (squared L2 up to a per-probe
    constant; SMALLER is closer), ties broken on neighbor_id.

    Plan: corpus → codes (one Arrow projection, then only small-int
    arrays flow); probes → flat distance LUT (one Arrow projection);
    broadcast the (small) probe LUTs; per pair, the score is a fold of
    ``n_subvectors`` array lookups — the ADC scan. One window shuffle
    for the top-k, nothing else.
    """
    n_sub = len(codebooks)
    n_centroids = len(codebooks[0])
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub_dim = cbs[0].shape[1]

    @pandas_udf("array<double>")
    def lut_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        luts = np.empty((len(mat), n_sub * n_centroids), dtype=np.float64)
        for s, cb in enumerate(cbs):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            luts[:, s * n_centroids : (s + 1) * n_centroids] = _seq_scores(sub, cb)
        return pd.Series(list(luts))

    c = pq_encode(corpus, codebooks, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), lut_udf(F.col(vec_col)).alias("_lut")
    )
    # fold over subvector index: acc + lut[s·K + codes[s] (+1 for 1-based)]
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("_lut"),
            (s * n_centroids + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        ),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("adc_score", F.round(score, round_digits))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_score").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_score", "rank")
    )
