"""N-gram novelty vs a reference snapshot (operators/novelty)."""

from computer_vision_foundations_spark.operators.novelty import (
    ngram_novelty,
)


def _run(spark, cand, ref, k=2):
    c = spark.createDataFrame(cand, "doc_id long, text string")
    r = spark.createDataFrame(ref, "doc_id long, text string")
    return {
        row["doc_id"]: (
            row["n_shingles"],
            row["n_novel"],
            row["novel_frac"],
        )
        for row in ngram_novelty(c, r, k=k).collect()
    }


def test_exact_copy_has_zero_novelty(spark):
    out = _run(
        spark,
        [(1, "a b c d")],
        [(10, "a b c d")],
    )
    assert out[1] == (3, 0, 0.0)


def test_disjoint_doc_is_fully_novel(spark):
    out = _run(spark, [(1, "x y z")], [(10, "a b c")])
    assert out[1] == (2, 2, 1.0)


def test_partial_overlap_fraction(spark):
    # candidate bigrams: a|b, b|c, c|x, x|y ; reference has a|b, b|c
    out = _run(spark, [(1, "a b c x y")], [(10, "a b c")])
    assert out[1] == (4, 2, 0.5)


def test_duplicate_shingles_counted_once(spark):
    # "a b a b" bigrams: a|b, b|a, a|b -> distinct {a|b, b|a}
    out = _run(spark, [(1, "a b a b")], [(10, "q r")])
    assert out[1] == (2, 2, 1.0)


def test_short_doc_whole_doc_shingle(spark):
    # shorter than k: one whole-doc shingle
    out = _run(spark, [(1, "a")], [(10, "a")], k=3)
    assert out[1] == (1, 0, 0.0)
