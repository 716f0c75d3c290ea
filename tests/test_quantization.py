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


def test_ivf_pq_matches_numpy_composition(spark, emb_df):
    """ivf_pq_topk == (numpy cell pruning + ADC scoring) end-to-end:
    cells from the coarse centroids, candidates restricted to each
    probe's n_probe_cells nearest cells, scored via the codebook LUT."""
    from computer_vision_foundations_spark.operators.quantization import (
        ivf_pq_topk,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    n_cells, n_probe = 4, 2
    vecs = _vectors().astype(np.float64)
    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    cents = np.asarray(random_centroids(DIM, n_cells, SEED), dtype=np.float64)
    codes = _np_codes(vecs)
    sd = DIM // SUBS

    d = ((cents * cents).sum(axis=1))[None, :] - 2.0 * (vecs @ cents.T)
    cell = d.argmin(axis=1)
    probe_cells = np.argsort(d, axis=1, kind="stable")[:, :n_probe]

    def adc(p, nbr):
        total = 0.0
        for s in range(SUBS):
            c = np.asarray(cbs[s][codes[nbr][s]], dtype=np.float64)
            sub = vecs[p, s * sd : (s + 1) * sd]
            dot = 0.0
            for j in range(sd):  # sequential, same order as the engine
                dot += sub[j] * c[j]
            total += float((c * c).sum()) - 2.0 * dot
        return round(total, 6)

    want = {}
    for p in range(2):
        cands = [
            n for n in range(len(vecs))
            if n != p and cell[n] in set(probe_cells[p])
        ]
        ranked = sorted(cands, key=lambda n: (adc(p, n), n))[:5]
        want[p] = [(n, adc(p, n)) for n in ranked]

    probes = emb_df.filter(F.col("vec_id") < 2)
    got_rows = ivf_pq_topk(
        emb_df, probes, cbs, [list(c) for c in cents], k=5, n_probe_cells=n_probe
    ).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.probe_id, r.rank)):
        got.setdefault(r.probe_id, []).append((r.neighbor_id, r.adc_score))
    assert got == want


def test_ivf_pq_scan_carries_no_vectors(spark, emb_df):
    """The composed index's join must move (cell, codes) and the probe
    LUT only — never embedding vectors (the point of IVF-PQ at scale)."""
    from computer_vision_foundations_spark.operators.quantization import (
        ivf_pq_topk,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    cents = random_centroids(DIM, 4, SEED)
    probes = emb_df.filter(F.col("vec_id") < 2)
    plan = (
        ivf_pq_topk(emb_df, probes, cbs, cents, k=4)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    after_join = plan.split("Join", 1)[1]
    assert "embedding" not in after_join.split("ArrowEvalPython", 1)[0]


def test_sq8_roundtrip_error_bounded(spark):
    import numpy as np

    from computer_vision_foundations_spark.operators.quantization import (
        sq8_encode,
        sq8_minmax,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.uniform(-2, 2, size=8)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq8_minmax(df, "embedding", 8)
    out = sq8_encode(df, mins, maxs).collect()
    for r in out:
        for i, c in enumerate(r.sq_codes):
            assert 0 <= c <= 255
            deq = mins[i] + c * (maxs[i] - mins[i]) / 255.0
            # reconstruction error bounded by half a quantization step
            assert abs(deq - r.embedding[i]) <= (maxs[i] - mins[i]) / 255.0


def test_sq8_topk_close_to_exact(spark):
    import numpy as np

    from computer_vision_foundations_spark.operators.quantization import (
        sq8_encode,
        sq8_minmax,
        sq8_topk,
    )

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq8_minmax(df, "embedding", 8)
    codes = sq8_encode(df, mins, maxs)
    probes = df.filter("vec_id < 3")
    approx = sq8_topk(codes, probes, mins, maxs, k=5).collect()
    # exact L2 top-5 via numpy
    mat = np.array([emb for _, emb in sorted(rows, key=lambda t: t[0])])
    hits = 0
    for pid in range(3):
        d = ((mat - mat[pid]) ** 2).sum(axis=1)
        d[pid] = np.inf
        exact5 = set(np.argsort(d, kind="stable")[:5])
        got5 = {r.neighbor_id for r in approx if r.probe_id == pid}
        hits += len(exact5 & got5)
    assert hits >= 12  # >=80% recall@5 at 8-bit precision


def test_sq8_degenerate_constant_dim(spark):
    from computer_vision_foundations_spark.operators.quantization import (
        sq8_encode,
        sq8_minmax,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, -5.0])], "vec_id long, embedding array<float>"
    )
    mins, maxs = sq8_minmax(df, "embedding", 2)
    out = {r.vec_id: r.sq_codes for r in sq8_encode(df, mins, maxs).collect()}
    assert out[1][0] == 0 and out[2][0] == 0  # constant dim -> code 0
    assert out[1][1] == 255 and out[2][1] == 0


def test_pq_rerank_exact_scores_on_shortlist(spark, emb_df):
    """Re-rank scores equal brute-force exact cosine, and with a
    shortlist covering the whole corpus the two-stage result IS the
    exact top-k (ADC approximation fully corrected)."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_rerank_topk,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        brute_force_knn,
    )

    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    probes = emb_df.filter(F.col("vec_id") < 3)
    exact = {
        (r.probe_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in brute_force_knn(emb_df, probes, k=5).collect()
    }
    # shortlist = corpus size → rerank must equal exact
    full = {
        (r.probe_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq_rerank_topk(
            emb_df, probes, cbs, k=5, shortlist=100
        ).collect()
    }
    assert full == exact
    # tight shortlist: every returned score still equals the exact
    # cosine for that pair (scores are never approximate after rerank)
    tight = pq_rerank_topk(emb_df, probes, cbs, k=5, shortlist=8).collect()
    exact_pairs = {
        (r.probe_id, r.neighbor_id): r.cos_sim
        for r in brute_force_knn(emb_df, probes, k=39).collect()
    }
    assert tight
    for r in tight:
        assert exact_pairs[(r.probe_id, r.neighbor_id)] == r.cos_sim


def test_pq_rerank_recall_improves_over_adc(spark, emb_df):
    """Two-stage recall@5 vs exact is at least the pure-ADC recall@5
    (rerank can only fix orderings inside the shortlist)."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_rerank_topk,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        brute_force_knn,
    )

    cbs = pq_codebooks(DIM, SUBS, CENTS, SEED)
    probes = emb_df.filter(F.col("vec_id") < 3)

    def topset(rows):
        out = {}
        for r in rows:
            out.setdefault(r.probe_id, set()).add(r.neighbor_id)
        return out

    exact = topset(brute_force_knn(emb_df, probes, k=5).collect())
    adc = topset(pq_adc_topk(emb_df, probes, cbs, k=5).collect())
    rr = topset(
        pq_rerank_topk(emb_df, probes, cbs, k=5, shortlist=20).collect()
    )
    for p in exact:
        r_adc = len(adc[p] & exact[p]) / 5
        r_rr = len(rr[p] & exact[p]) / 5
        assert r_rr >= r_adc
