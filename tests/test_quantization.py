"""Product quantization: encode correctness vs numpy brute force, ADC
score consistency, and plan shape (codes scan must not carry vectors)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.quantization import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)

DIM, SUBS, CENTS, SEED = 16, 4, 8, 7


def _vectors(n=40, seed=11):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark):
    vecs = _vectors()
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_codes(vecs):
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    sd = DIM // SUBS
    out = np.empty((len(vecs), SUBS), dtype=int)
    for s, cb in enumerate(cbs):
        cb = np.asarray(cb)
        sub = vecs[:, s * sd : (s + 1) * sd].astype(np.float64)
        d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        out[:, s] = d.argmin(axis=1)
    return out


def test_encode_matches_numpy_argmin(spark, emb_df):
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    got = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb_df, cbs).collect()
    }
    want = _np_codes(_vectors())
    for i, codes in got.items():
        assert codes == list(want[i])
        assert all(0 <= c < CENTS for c in codes)


def test_adc_scores_equal_lut_sums(spark, emb_df):
    """adc_score must equal the sum of (||c||² − 2·p_sub·c_code) over
    subvectors, recomputed independently in numpy (same f64 math)."""
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    vecs = _vectors().astype(np.float64)
    codes = _np_codes(_vectors())
    sd = DIM // SUBS
    probes = emb_df.filter(F.col("vec_id") < 3)
    rows = pq_adc_topk(emb_df, probes, cbs, k=5).collect()
    assert len(rows) == 3 * 5
    for r in rows:
        p = vecs[r.probe_id]
        want = 0.0
        for s, cb in enumerate(cbs):
            c = np.asarray(cb[codes[r.neighbor_id][s]])
            sub = p[s * sd : (s + 1) * sd]
            want += float((c * c).sum()) - 2.0 * float((sub * c).sum())
        assert abs(r.adc_score - want) < 1e-6


def test_topk_rank_shape(spark, emb_df):
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    probes = emb_df.filter(F.col("vec_id") < 2)
    out = pq_adc_topk(emb_df, probes, cbs, k=4)
    rows = out.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for pid, rs in by_probe.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4]
        scores = [r.adc_score for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores)
        assert pid not in {r.neighbor_id for r in rs}


def test_codes_scan_carries_no_vectors(spark, emb_df):
    """The candidate scan side must project codes only — the embedding
    column is dropped before the join (the point of PQ at scale)."""
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    probes = emb_df.filter(F.col("vec_id") < 2)
    plan = pq_adc_topk(emb_df, probes, cbs, k=4)._jdf.queryExecution().optimizedPlan().toString()
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert joins, plan
    # the join inputs reference codes and _lut, never the raw embedding
    after_join = plan.split("Join", 1)[1]
    assert "embedding" not in after_join.split("ArrowEvalPython", 1)[0]
