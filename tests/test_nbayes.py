"""Multinomial Naive Bayes (operators/nbayes)."""

import math

from computer_vision_foundations_spark.operators.nbayes import (
    nb_fit_score,
    nb_train_score,
)


DOCS = [
    (1, "spark join join shuffle", "en"),
    (2, "spark scan filter join", "en"),
    (3, "tabla consulta union union", "es"),
    (4, "consulta tabla filtro", "es"),
    (5, "join consulta spark", "en"),
]


def _score(docs, doc_tokens, cls, alpha=1.0):
    """Reference NB joint log-likelihood computed in plain Python."""
    toks = [(d, c, t) for d, body, c in docs for t in body.split()]
    vocab = {t for _, _, t in toks}
    n_k = {}
    c_kw = {}
    for _, c, t in toks:
        n_k[c] = n_k.get(c, 0) + 1
        c_kw[(c, t)] = c_kw.get((c, t), 0) + 1
    prior = math.log(
        sum(1 for _, _, c in docs if c == cls) / len(docs)
    )
    s = prior
    for t in doc_tokens:
        s += math.log(
            (c_kw.get((cls, t), 0) + alpha)
            / (n_k[cls] + alpha * len(vocab))
        )
    return s


def test_predictions_and_scores_match_reference(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )
    out = {
        r["doc_id"]: (r["predicted"], r["log_score"])
        for r in nb_train_score(df).collect()
    }
    assert len(out) == len(DOCS)
    for doc_id, body, actual in DOCS:
        toks = body.split()
        scores = {
            c: _score(DOCS, toks, c) for c in ("en", "es")
        }
        want_cls = max(sorted(scores), key=lambda c: scores[c])
        pred, got = out[doc_id]
        assert pred == want_cls
        assert abs(got - round(scores[want_cls], 6)) < 1e-6
    # sanity: the classifier separates the two token families
    assert out[1][0] == "en" and out[3][0] == "es"


def test_empty_tokens_ignored(spark):
    df = spark.createDataFrame(
        [(1, "a  b", "x"), (2, "c d", "y")],
        "doc_id long, text string, lang string",
    )
    rows = nb_train_score(df).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}

def _fit_score_ref(train_docs, doc_tokens, cls, alpha=1.0):
    """Plain-Python twin of nb_fit_score: model from train_docs only,
    OOV tokens get the zero-count smoothing floor."""
    toks = [(c, t) for _, body, c in train_docs for t in body.split()]
    vocab = {t for _, t in toks}
    n_k = {}
    c_kw = {}
    for c, t in toks:
        n_k[c] = n_k.get(c, 0) + 1
        c_kw[(c, t)] = c_kw.get((c, t), 0) + 1
    prior = math.log(
        sum(1 for _, _, c in train_docs if c == cls) / len(train_docs)
    )
    s = prior
    for t in doc_tokens:
        s += math.log(
            (c_kw.get((cls, t), 0) + alpha)
            / (n_k[cls] + alpha * len(vocab))
        )
    return s


def test_fit_score_matches_resubstitution_on_same_data(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )
    resub = {
        r["doc_id"]: (r["predicted"], r["log_score"])
        for r in nb_train_score(df).collect()
    }
    split = {
        r["doc_id"]: (r["predicted"], r["log_score"])
        for r in nb_fit_score(df, df).collect()
    }
    assert resub == split


def test_fit_score_oov_floor(spark):
    train = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )
    # held-out doc with one in-vocab and one OOV token
    held = spark.createDataFrame(
        [(99, "spark quux", "en")],
        "doc_id long, text string, lang string",
    )
    rows = nb_fit_score(train, held).collect()
    assert len(rows) == 1
    r = rows[0]
    scores = {
        c: _fit_score_ref(DOCS, ["spark", "quux"], c)
        for c in ("en", "es")
    }
    want = max(sorted(scores), key=lambda c: scores[c])
    assert r["predicted"] == want
    assert abs(r["log_score"] - round(scores[want], 6)) < 1e-6
