"""Lexical diversity indices (operators/diversity)."""

import math

import pytest

from computer_vision_foundations_spark.operators.diversity import (
    group_diversity,
)


def test_uniform_distribution_maxes_entropy(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "u"), (2, "x x x x", "k")],
        "doc_id long, text string, source string",
    )
    got = {r["grp"]: r for r in group_diversity(df).collect()}
    u = got["u"]
    assert u["n_toks"] == 4 and u["n_vocab"] == 4
    assert u["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert u["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert u["simpson"] == pytest.approx(0.25, abs=1e-6)
    k = got["k"]
    # single token: entropy 0, simpson 1, norm_entropy undefined (NULL)
    assert k["entropy"] == 0.0
    assert k["simpson"] == 1.0
    assert k["norm_entropy"] is None


def test_skewed_beats_uniform_on_simpson(spark):
    df = spark.createDataFrame(
        [(1, "a a a b", "s"), (2, "a b c d", "u")],
        "doc_id long, text string, source string",
    )
    got = {r["grp"]: r for r in group_diversity(df).collect()}
    assert got["s"]["simpson"] > got["u"]["simpson"]
    assert got["s"]["entropy"] < got["u"]["entropy"]
    # hand value: p = (3/4, 1/4)
    want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got["s"]["entropy"] == pytest.approx(want, abs=1e-6)


def test_empty_tokens_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a  b", "g")], "doc_id long, text string, source string"
    )
    r = group_diversity(df).collect()[0]
    assert r["n_toks"] == 2 and r["n_vocab"] == 2


def test_doc_char_entropy(spark):
    import math

    from computer_vision_foundations_spark.operators.diversity import (
        doc_char_entropy,
    )

    df = spark.createDataFrame(
        [(1, "aaaa", "s"), (2, "abcd", "s"), (3, "aabb", "s")],
        "doc_id long, text string, source string",
    )
    got = {
        r["id"]: (r["n_chars_m"], r["char_entropy"])
        for r in doc_char_entropy(df).collect()
    }
    assert got[1] == (4, 0.0)  # constant fill
    assert got[2][1] == pytest.approx(math.log(4), abs=1e-6)
    assert got[3][1] == pytest.approx(math.log(2), abs=1e-6)
    # diversity orders as expected
    assert got[1][1] < got[3][1] < got[2][1]


def test_lexical_richness(spark):
    from computer_vision_foundations_spark.operators.diversity import (
        lexical_richness,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d", "rich"),     # all hapax
            (2, "x x x x y", "spam"),   # heavy repetition
        ],
        "doc_id long, text string, source string",
    )
    got = {r["grp"]: r for r in lexical_richness(df).collect()}
    rich, spam = got["rich"], got["spam"]
    assert rich["hapax_ratio"] == 1.0
    # Yule's K for all-hapax text: 10^4*(N - N)/N^2 = 0
    assert rich["yule_k"] == 0.0
    assert spam["hapax_ratio"] == pytest.approx(0.5)
    # spam: counts {x:4, y:1}, K = 1e4*(16+1-5)/25 = 4800
    assert spam["yule_k"] == pytest.approx(4800.0)
