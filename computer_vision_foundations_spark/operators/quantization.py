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

__all__ = [
    "pq_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "pq_rerank_topk",
    "ivf_pq_topk",
]


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


def pq_rerank_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """ADC shortlist → exact-cosine re-rank (the IVFADC+R pattern,
    Jégou et al. 2011): the cheap compressed-code scan keeps the top
    ``shortlist`` candidates per probe, then ONLY those rows fetch
    their float vectors for an exact cosine, and the final top-``k``
    ranks by the exact score.

    Returns ``(probe_id, neighbor_id, cos_sim, rank)`` — identical
    schema to ``brute_force_knn``, so recall of the two-stage
    pipeline is directly measurable against the exact baseline.

    Scale shape: stage 1 is the ADC code scan (vectors never read);
    stage 2 BROADCASTS the |probes|·shortlist id pairs against the
    corpus — a map-side hash semi-join prunes the vector fetch to
    exactly the shortlist rows, so the expensive float math touches
    ``|probes| · shortlist`` vectors no matter how large the corpus.
    One window shuffle per stage, nothing else.
    """
    from computer_vision_foundations_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )

    short = pq_adc_topk(
        corpus,
        probes,
        codebooks,
        k=shortlist,
        vec_col=vec_col,
        id_col=id_col,
        round_digits=round_digits,
    ).select("probe_id", "neighbor_id")
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(vec_col).alias("_cn"),
    )
    pvec = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        l2_norm(vec_col).alias("_pn"),
    )
    scored = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(pvec), "probe_id")
        .withColumn(
            "cos_sim",
            F.round(
                cosine_from_norms("_pv", "_cv", "_pn", "_cn"),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    k: int = 10,
    n_probe_cells: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    broadcast_probes: bool = True,
) -> DataFrame:
    """IVF + PQ composed (the FAISS ``IndexIVFPQ`` shape) — the index a
    real 100 TB ANN deployment ships.

    Coarse quantizer: every corpus vector is assigned to its nearest of
    the ``centroids`` cells and compressed to PQ ``codes`` in ONE
    Arrow-batched projection — ``(id, cell, codes)`` is the persisted
    representation; float vectors never leave that projection. Probes
    fan out to their ``n_probe_cells`` nearest cells and carry a
    precomputed ADC lookup table, so the scan is an equi-join on cell
    id that touches ``n_probe_cells / n_cells`` of the corpus and
    scores candidates with ``n_subvectors`` array lookups each — no
    per-pair vector math anywhere. One window shuffle for the top-k.

    Returns ``(probe_id, neighbor_id, adc_score, rank)`` (squared-L2
    ADC score up to a per-probe constant; SMALLER is closer; ties on
    neighbor_id). Recall tunes with ``n_probe_cells`` and the codebook
    size; measure it with ``operators.evaluation.ann_recall`` against
    ``brute_force_knn``.

    ``broadcast_probes``: same rationale as ``ivf_flat_knn`` — with
    only ``n_cells`` distinct join keys a shuffle join collapses to
    ≤ n_cells partitions; broadcast keeps corpus-side parallelism.
    Codebooks/centroids are passed in (seeded or trained upstream), so
    both stages replay as SQL literals for the differential oracle.
    """
    c = encode_cell_codes(corpus, codebooks, centroids, vec_col, id_col)
    p = probe_fanout(probes, codebooks, centroids, n_probe_cells, vec_col, id_col)
    return adc_topk_from_encoded(
        c, p, len(codebooks), len(codebooks[0]), k, round_digits, broadcast_probes
    )


def encode_cell_codes(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(neighbor_id, _cell, codes)`` — the PERSISTED representation of
    an IVF-PQ index (one Arrow-batched projection; float vectors never
    leave it). `ann_index.build_ivf_pq_index` writes exactly this,
    partitioned by ``_cell``."""
    n_sub = len(codebooks)
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub_dim = cbs[0].shape[1]
    cmat = np.asarray(centroids, dtype=np.float64)  # (n_cells, dim)
    cnorm = (cmat * cmat).sum(axis=1)

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def cell_and_codes_udf(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        d = cnorm[None, :] - 2.0 * (mat @ cmat.T)
        codes = np.empty((len(mat), n_sub), dtype=np.int32)
        for s, cb in enumerate(cbs):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            codes[:, s] = _seq_scores(sub, cb).argmin(axis=1)
        return pd.DataFrame(
            {"cell": d.argmin(axis=1).astype(np.int32), "codes": list(codes)}
        )

    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        cell_and_codes_udf(F.col(vec_col)).alias("_cc"),
    ).select(
        "neighbor_id", F.col("_cc.cell").alias("_cell"), F.col("_cc.codes").alias("codes")
    )


def probe_fanout(
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    n_probe_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(probe_id, _cell, _lut)`` — each probe exploded to its
    ``n_probe_cells`` nearest cells, carrying a precomputed ADC lookup
    table."""
    n_sub = len(codebooks)
    n_centroids = len(codebooks[0])
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub_dim = cbs[0].shape[1]
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)

    @pandas_udf("struct<cells:array<int>, lut:array<double>>")
    def probe_cells_and_lut_udf(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        d = cnorm[None, :] - 2.0 * (mat @ cmat.T)
        cells = np.argsort(d, axis=1, kind="stable")[:, :n_probe_cells]
        luts = np.empty((len(mat), n_sub * n_centroids), dtype=np.float64)
        for s, cb in enumerate(cbs):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            luts[:, s * n_centroids : (s + 1) * n_centroids] = _seq_scores(sub, cb)
        return pd.DataFrame(
            {"cells": list(cells.astype(np.int32)), "lut": list(luts)}
        )

    return probes.select(
        F.col(id_col).alias("probe_id"),
        probe_cells_and_lut_udf(F.col(vec_col)).alias("_pl"),
    ).select(
        "probe_id",
        F.explode(F.col("_pl.cells")).alias("_cell"),
        F.col("_pl.lut").alias("_lut"),
    )


def adc_topk_from_encoded(
    c: DataFrame,
    p: DataFrame,
    n_sub: int,
    n_centroids: int,
    k: int,
    round_digits: int = 6,
    broadcast_probes: bool = True,
) -> DataFrame:
    """ADC scan over an encoded corpus: cell equi-join + n_sub array
    lookups per candidate + one top-k window. ``c`` is
    `encode_cell_codes` output (or the persisted index read back);
    ``p`` is `probe_fanout` output."""
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
        c.join(F.broadcast(p) if broadcast_probes else p, on="_cell")
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


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): per-dimension uint8 codes
# ---------------------------------------------------------------------------


def sq8_minmax(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 training
    step. ONE unrolled hash aggregate (2·dim scalar aggs, map-side
    combine) and a model-sized driver collect, same class as k-means
    centroids."""
    aggs = []
    for i in range(dim):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs.append(F.min(e).alias(f"_mn{i}"))
        aggs.append(F.max(e).alias(f"_mx{i}"))
    row = df.agg(*aggs).collect()[0]
    return (
        [float(row[f"_mn{i}"]) for i in range(dim)],
        [float(row[f"_mx{i}"]) for i in range(dim)],
    )


def _sq8_lits(vals: list[float]):
    return F.array(*[F.lit(v) for v in vals])


def sq8_encode(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
    out_col: str = "sq_codes",
) -> DataFrame:
    """uint8 codes: ``floor((x_i − min_i) · 255/(max_i − min_i) + 0.5)``
    clamped to [0, 255] (explicit floor(+0.5), not round(), so both
    engines share one rounding rule). A 64-dim float vector becomes 64
    small ints — 4× smaller than float32, 8× than float64 — with no
    codebook to train beyond the min/max pass. One narrow codegen
    projection; constant-degenerate dims (max == min) encode as 0."""
    scales = [
        (255.0 / (mx - mn)) if mx > mn else 0.0 for mn, mx in zip(mins, maxs)
    ]
    mn_a, sc_a = _sq8_lits(mins), _sq8_lits(scales)
    code = F.transform(
        F.col(vec_col),
        lambda x, i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x.cast("double") - F.element_at(mn_a, i + 1))
                    * F.element_at(sc_a, i + 1)
                    + F.lit(0.5)
                ).cast("int"),
            ),
        ),
    )
    return df.withColumn(out_col, code)


def sq8_topk(
    corpus_codes: DataFrame,
    probes: DataFrame,
    mins: list[float],
    maxs: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes_col: str = "sq_codes",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k by squared L2 against DEQUANTIZED codes:
    ``d(p, c) = Σ_i (p_i − (min_i + code_i·step_i))²`` — the corpus
    side scans uint8 codes only (the SQ analogue of PQ's ADC; no
    per-pair float-vector fetch). Probes are broadcast (the tiny side,
    as in ``brute_force_knn``); per-pair math is one JVM fold over the
    code array. Ascending distance, ties by neighbor id."""
    steps = [
        ((mx - mn) / 255.0) if mx > mn else 0.0 for mn, mx in zip(mins, maxs)
    ]
    mn_a, st_a = _sq8_lits(mins), _sq8_lits(steps)
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), F.col(codes_col).alias("_codes")
    )
    diff = lambda code, i: (
        F.element_at(F.col("_pv"), i + 1).cast("double")
        - (
            F.element_at(mn_a, i + 1)
            + code.cast("double") * F.element_at(st_a, i + 1)
        )
    )
    dist = F.aggregate(
        F.transform(F.col("_codes"), lambda code, i: diff(code, i) * diff(code, i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("sq_dist", F.round(dist, round_digits))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sq_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "sq_dist", "rank")
    )
