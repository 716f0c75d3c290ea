"""TextRank: agreement with a pure-Python reference on hand corpora,
plus filter/tiebreak invariants."""

import math

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.textrank import (
    textrank_keywords,
)


def _py_textrank(texts, min_len=4, damping=0.85, n_iter=5):
    und = {}
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            if len(a) >= min_len and len(b) >= min_len and a != b:
                k = (min(a, b), max(a, b))
                und[k] = und.get(k, 0) + 1
    adj = {}
    for (a, b), w in und.items():
        adj.setdefault(a, {})[b] = float(w)
        adj.setdefault(b, {})[a] = float(w)
    s = {u: sum(nb.values()) for u, nb in adj.items()}
    r = {u: 1.0 for u in adj}
    for _ in range(n_iter):
        r = {
            v: (1.0 - damping)
            + damping * sum(w / s[u] * r[u] for u, w in adj[v].items())
            for v in adj
        }
    return r


TEXTS = [
    "alpha beta gamma alpha beta x beta",
    "gamma alpha alpha gamma delta",
    "ab cd alpha beta beta beta",  # short tokens dropped; self-pair dropped
]


def test_textrank_matches_python(spark):
    docs = spark.createDataFrame([Row(text=t) for t in TEXTS])
    got = {
        r["word"]: r["rank"]
        for r in textrank_keywords(docs, top_k=50).collect()
    }
    want = _py_textrank(TEXTS)
    assert set(got) == set(want)
    for w, v in want.items():
        assert math.isclose(got[w], round(v, 6), abs_tol=2e-6), w


def test_textrank_filters_short_and_self(spark):
    docs = spark.createDataFrame([Row(text=t) for t in TEXTS])
    words = {r["word"] for r in textrank_keywords(docs, top_k=50).collect()}
    assert "ab" not in words and "cd" not in words and "x" not in words
    # "beta beta" adjacency is a self-pair: contributes no edge, but
    # beta still ranks via its alpha/gamma edges
    assert "beta" in words


def test_textrank_topk_and_tiebreak(spark):
    # a symmetric 4-cycle: all ranks equal -> tiebreak is word asc
    docs = spark.createDataFrame(
        [Row(text="aaaa bbbb cccc dddd aaaa")]
    )
    rows = textrank_keywords(docs, top_k=2).collect()
    assert [r["word"] for r in rows] == ["aaaa", "bbbb"]
