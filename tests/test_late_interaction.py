"""MaxSim late interaction: agreement with numpy, and the semantics
that distinguish it from pooled cosine (partial match wins)."""

import numpy as np
from pyspark.sql import Row

from computer_vision_foundations_spark.operators.late_interaction import (
    maxsim_topk,
)


def _np_maxsim(q, d, n_tokens, dim):
    qm = np.asarray(q, dtype=np.float64).reshape(n_tokens, dim)
    dm = np.asarray(d, dtype=np.float64).reshape(n_tokens, dim)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    dn = dm / np.linalg.norm(dm, axis=1, keepdims=True)
    return float((qn @ dn.T).max(axis=1).sum())


def _vectors(seed=3, n=25, n_tokens=4, dim=4):
    rng = np.random.default_rng(seed)
    return {
        i: rng.normal(size=n_tokens * dim).astype(np.float32).tolist()
        for i in range(n)
    }


def test_maxsim_matches_numpy(spark):
    vecs = _vectors()
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    probes = df.filter(df.vec_id < 2)
    got = maxsim_topk(df, probes, n_tokens=4, dim=4, k=5).collect()
    assert len(got) == 10
    for r in got:
        want = _np_maxsim(
            vecs[r["probe_id"]], vecs[r["neighbor_id"]], 4, 4
        )
        assert abs(r["maxsim"] - round(want, 6)) < 2e-6
    # ranks are 1..5 per probe, descending score
    for pid in (0, 1):
        rows = sorted(
            (r for r in got if r["probe_id"] == pid),
            key=lambda r: r["rank"],
        )
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(
            rows[i]["maxsim"] >= rows[i + 1]["maxsim"] for i in range(4)
        )


def test_maxsim_rewards_partial_token_match(spark):
    # doc A matches the query's first token exactly but is orthogonal
    # elsewhere; doc B is a mediocre 0.5-ish match on every token.
    # MaxSim must give A the full +1 for the matched token.
    q = [1.0, 0.0, 0.0, 1.0]  # 2 tokens x 2 dims
    a = [1.0, 0.0, 1.0, 0.0]
    rows = [
        Row(vec_id=0, embedding=q),
        Row(vec_id=1, embedding=a),
    ]
    df = spark.createDataFrame(rows)
    got = maxsim_topk(
        df, df.filter(df.vec_id == 0), n_tokens=2, dim=2, k=1
    ).collect()
    assert len(got) == 1
    want = _np_maxsim(q, a, 2, 2)
    assert abs(got[0]["maxsim"] - round(want, 6)) < 2e-6
    assert got[0]["maxsim"] >= 1.0  # the exact-match token contributes 1
