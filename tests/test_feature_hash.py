import hashlib

import pytest

from computer_vision_foundations_spark.functions.feature_hash import (
    hashed_features,
)


def _bucket_sign(token, d=64):
    h = hashlib.md5(token.encode()).hexdigest()
    return int(h[:7], 16) % d, 1 if int(h[7:14], 16) % 2 == 0 else -1


def test_matches_reference_hashing(spark):
    text = "alpha beta alpha gamma"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {(r["bucket"]): r["weight"] for r in hashed_features(df).collect()}
    want = {}
    for t in text.split(" "):
        b, s = _bucket_sign(t)
        want[b] = want.get(b, 0) + s
    want = {b: w for b, w in want.items() if w != 0}
    assert out == want


def test_repeated_tokens_accumulate(spark):
    df = spark.createDataFrame([(1, "x x x")], ["doc_id", "text"])
    out = hashed_features(df).collect()
    assert len(out) == 1
    b, s = _bucket_sign("x")
    assert out[0]["bucket"] == b and out[0]["weight"] == 3 * s


def test_dimension_bound_and_sparsity(spark):
    text = " ".join(f"tok{i}" for i in range(500))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = hashed_features(df, d=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in out)
    assert len(out) <= 16  # bounded by d regardless of vocab size
    assert all(r["weight"] != 0 for r in out)


def test_no_dictionary_state(spark):
    # same token always lands in the same bucket across frames —
    # hash-determined, no fitted state
    a = hashed_features(
        spark.createDataFrame([(1, "zebra")], ["doc_id", "text"])
    ).collect()[0]
    b = hashed_features(
        spark.createDataFrame([(9, "other words zebra")], ["doc_id", "text"])
    ).where("weight != 0").collect()
    zb = [r for r in b if r["bucket"] == a["bucket"]]
    assert zb, "zebra bucket must be stable across frames"
