"""Positional phrase search (operators/retrieval.phrase_search)."""

from computer_vision_foundations_spark.operators.retrieval import (
    phrase_search,
)


def _run(spark, docs, phrases):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(phrases, "phrase_id int, terms array<string>")
    return {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_search(d, p).collect()
    }


def test_exact_adjacency_required(spark):
    docs = [
        (1, "hash join scan"),
        (2, "hash scan join"),  # terms present, not adjacent
        (3, "a hash join b hash join"),
    ]
    out = _run(spark, docs, [(0, ["hash", "join"])])
    assert out == {(0, 1): 1, (0, 3): 2}


def test_trigram_and_overlap(spark):
    docs = [(1, "a a a a")]
    out = _run(spark, docs, [(0, ["a", "a", "a"])])
    # overlapping occurrences at positions 0 and 1
    assert out == {(0, 1): 2}


def test_mixed_lengths_independent(spark):
    docs = [(1, "x y z w"), (2, "x y q")]
    out = _run(
        spark,
        docs,
        [(0, ["x", "y"]), (1, ["y", "z", "w"]), (2, ["q", "q"])],
    )
    assert out == {(0, 1): 1, (0, 2): 1, (1, 1): 1}


def test_phrase_crossing_doc_end_not_matched(spark):
    out = _run(spark, [(1, "a b")], [(0, ["b", "c"])])
    assert out == {}
