"""BM25: scores vs a hand-rolled python implementation, pruning
semantics (query whose terms are absent yields nothing), and ranking
determinism."""

import math

import pytest

from computer_vision_foundations_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "spark spark spark caching and shuffles"),
    (3, "ducks swim on the lake"),
    (4, "the cluster schedules spark tasks"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


@pytest.fixture()
def frames(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(
        [(0, ["spark", "cluster"]), (1, ["ducks"]), (2, ["absentterm"])],
        "query_id int, terms array<string>",
    )
    return docs, queries


def test_bm25_matches_reference_formula(spark, frames):
    docs, queries = frames
    rows = bm25_topk(docs, queries, k=10).collect()
    got = {(r.query_id, r.doc_id): r.bm25 for r in rows}
    want0 = _py_bm25(DOCS, ["spark", "cluster"])
    for d, s in want0.items():
        assert got[(0, d)] == pytest.approx(s, abs=1e-4)
    want1 = _py_bm25(DOCS, ["ducks"])
    assert got[(1, 3)] == pytest.approx(want1[3], abs=1e-4)
    # query 2's term never occurs -> no rows at all
    assert not [r for r in rows if r.query_id == 2]


def test_bm25_ranking_and_topk(spark, frames):
    docs, queries = frames
    rows = bm25_topk(docs, queries, k=2).collect()
    q0 = sorted((r for r in rows if r.query_id == 0), key=lambda r: r.rank)
    assert len(q0) == 2
    assert [r.rank for r in q0] == [1, 2]
    assert q0[0].bm25 >= q0[1].bm25
    # doc 4 matches BOTH terms; tf saturation (k1) keeps doc 2's
    # repeated 'spark' from outranking a two-term match
    assert q0[0].doc_id == 4


def test_rrf_fuse_math_and_overlap_boost(spark):
    """RRF: a doc present in both rankings must outscore docs ranked
    similarly in only one; scores match 1/(k+r) sums exactly."""
    from computer_vision_foundations_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 99, 2)], ["query_id", "doc_id", "rank"]
    )
    rows = {r.doc_id: r for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    assert rows[11].n_rankers == 2
    assert rows[11].rrf_score == round(1 / 62 + 1 / 61, 6)
    assert rows[10].rrf_score == round(1 / 61, 6)
    # overlap doc ranks first despite rank-2 position in list a
    assert rows[11].rank == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rrf_fuse([])
