import pytest

from computer_vision_foundations_spark.operators.paragraphs import (
    doc_paragraphs,
    paragraph_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c x y z"),          # paras: 'a b c', 'x y z'
        (2, "a b c q r s t"),        # shares 'a b c'; tail 't' short para
        (3, "x y z x y z"),          # shares 'x y z' (twice, not keeper)
        (4, "u v w"),                # unique single para
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_paragraph_segmentation(docs):
    p = doc_paragraphs(docs, para_words=3).collect()
    by_doc = {}
    for r in p:
        by_doc.setdefault(r["doc_id"], []).append((r["para_idx"], r["para"]))
    assert sorted(by_doc[1]) == [(0, "a b c"), (1, "x y z")]
    # short tail paragraph is kept, not padded
    assert sorted(by_doc[2]) == [(0, "a b c"), (1, "q r s"), (2, "t")]


def test_keeper_doc_wins(docs):
    out = {r["doc_id"]: r.asDict() for r in paragraph_dedup(docs).collect()}
    # doc 1 is the smallest id for both its paragraphs
    assert out[1]["n_kept"] == 2 and out[1]["cleaned_text"] == "a b c x y z"
    # doc 2 loses 'a b c' to doc 1
    assert out[2]["n_kept"] == 2 and out[2]["cleaned_text"] == "q r s t"
    # doc 3 loses both copies of 'x y z' to doc 1
    assert out[3]["n_kept"] == 0 and out[3]["cleaned_text"] == ""
    # unique paragraphs always survive
    assert out[4]["n_kept"] == 1 and out[4]["cleaned_text"] == "u v w"


def test_counts_are_consistent(docs):
    out = paragraph_dedup(docs).collect()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_paras"]
        assert r["cleaned_len"] == len(r["cleaned_text"])


def test_exactly_one_survivor_per_distinct_paragraph(docs, spark):
    p = doc_paragraphs(docs, para_words=3)
    n_distinct = p.select("para_hash").distinct().count()
    total_kept = sum(r["n_kept"] for r in paragraph_dedup(docs).collect())
    # first-occurrence keeper: exactly one copy corpus-wide, even when
    # the keeper document itself repeats the paragraph (doc 3)
    assert total_kept == n_distinct


def test_within_keeper_repeats_are_cut(spark):
    # the ONLY doc containing 'a b c' repeats it: second copy is cut
    df = spark.createDataFrame(
        [(1, "a b c a b c x y z")], ["doc_id", "text"]
    )
    out = paragraph_dedup(df).collect()[0]
    assert out["n_paras"] == 3 and out["n_kept"] == 2
    assert out["cleaned_text"] == "a b c x y z"
