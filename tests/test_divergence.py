"""Source JSD (operators/divergence)."""

import math

import pytest

from computer_vision_foundations_spark.operators.divergence import (
    source_jsd,
)


def _hand_jsd(docs, alpha=1.0):
    counts, totals, vocab = {}, {}, set()
    for _, text, src in docs:
        for t in text.split():
            counts[(src, t)] = counts.get((src, t), 0) + 1
            totals[src] = totals.get(src, 0) + 1
            vocab.add(t)
    v = len(vocab)
    srcs = sorted(totals)
    out = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            s = 0.0
            for t in vocab:
                pa = (counts.get((a, t), 0) + alpha) / (totals[a] + alpha * v)
                pb = (counts.get((b, t), 0) + alpha) / (totals[b] + alpha * v)
                m = (pa + pb) / 2
                s += (pa * math.log(pa / m) + pb * math.log(pb / m)) / 2
            out[(a, b)] = s
    return out


def test_jsd_matches_hand_computation(spark):
    docs = [
        (1, "a a b", "x"),
        (2, "a b b c", "y"),
        (3, "c c c", "z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        (r["src_a"], r["src_b"]): r["jsd"]
        for r in source_jsd(df).collect()
    }
    want = _hand_jsd(docs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(round(want[k], 6), abs=1e-6)
    # identical distributions diverge least, disjoint most
    assert got[("x", "y")] < got[("x", "z")]


def test_jsd_identical_sources_is_zero(spark):
    docs = [(1, "a b c", "x"), (2, "a b c", "y")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    row = source_jsd(df).collect()[0]
    assert row["jsd"] == 0.0


def test_jsd_bounded_by_ln2(spark):
    docs = [(1, "a a a", "x"), (2, "b b b", "y")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    row = source_jsd(df).collect()[0]
    assert 0.0 < row["jsd"] <= math.log(2)
