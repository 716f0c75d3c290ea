"""PPJoin prefix-filtered Jaccard: exact agreement with brute force,
boundary-threshold pairs included, and the prefix actually prunes."""

import itertools
import random

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.ppjoin import (
    prefix_jaccard_pairs,
)


def _shingles(text, k=3):
    toks = text.split(" ")
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i : i + k]) for i in range(n)}


def _brute(texts, k=3, t=0.5):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(
        sorted(texts.items()), 2
    ):
        sa, sb = _shingles(ta, k), _shingles(tb, k)
        inter = len(sa & sb)
        if inter:
            j = inter / (len(sa) + len(sb) - inter)
            if j >= t:
                out[(ia, ib)] = round(j, 6)
    return out


def _corpus(seed=7, n=40):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = {}
    for i in range(n):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 20)))
    # planted near-dups: copy with small edits
    for i in range(0, n, 7):
        toks = texts[i].split(" ")
        toks[len(toks) // 2] = "edited"
        texts[i + 1] = " ".join(toks)
    return texts


def _run(spark, texts, t):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=s) for i, s in texts.items()]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, threshold=t).collect()
    }
    assert got == _brute(texts, t=t)
    return got


def test_ppjoin_matches_brute_force(spark):
    got = _run(spark, _corpus(), 0.5)
    assert got  # planted dups must surface


def test_ppjoin_exact_threshold_boundary(spark):
    # |A|=|B|=3 shingles, intersection 2 -> J = 2/4 = 0.5 exactly:
    # the >= threshold boundary pair must be kept.
    texts = {
        1: "a b c d e",  # shingles: abc bcd cde
        2: "a b c d x",  # shingles: abc bcd cdx
    }
    got = _run(spark, texts, 0.5)
    assert got == {(1, 2): 0.5}


def test_ppjoin_hot_shingle_leaves_prefix(spark):
    # every doc shares one hot shingle but pairs are below threshold:
    # brute force agrees and nothing qualifies.
    texts = {
        i: f"hot hot hot u{i} v{i} w{i} x{i} y{i} z{i}" for i in range(12)
    }
    got = _run(spark, texts, 0.5)
    assert got == {}
