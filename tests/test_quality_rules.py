import pytest

from computer_vision_foundations_spark.operators.quality_rules import (
    gopher_quality_flags,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # clean doc: enough words, normal lengths, stopwords present
        (1, "the quick brown fox jumps over the lazy dog and it runs"),
        # too short
        (2, "tiny doc"),
        # symbol-heavy: '#' per word
        (3, "# # # # # # # # # # # #"),
        # bullet lines dominate
        (4, "- alpha beta\n- gamma delta\n- epsilon zeta"),
        # ellipsis endings dominate
        (5, "first line...\nsecond line...\nthird one..."),
        # numeric words (no alphabetic chars)
        (6, "111 222 333 444 555 666 777 888 999 000 123 456"),
        # no stopwords
        (7, "zebra quokka wombat lemur gecko iguana puffin osprey heron"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _flags(docs, **kw):
    out = gopher_quality_flags(docs, min_words=5, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_rule_flags_fire_individually(docs):
    f = _flags(docs)
    assert f[1]["passes_gopher"]
    assert not f[2]["rule_word_count"]
    assert not f[3]["rule_symbol_ratio"] and f[3]["symbol_ratio"] == 1.0
    assert not f[4]["rule_bullet_lines"] and f[4]["bullet_ratio"] == 1.0
    assert not f[5]["rule_ellipsis_lines"]
    assert not f[6]["rule_alpha_words"] and f[6]["alpha_word_ratio"] == 0.0
    assert not f[7]["rule_stopwords"] and f[7]["n_stopwords"] == 0


def test_statistics_are_exact(docs):
    f = _flags(docs)
    assert f[1]["n_words"] == 12
    # 'the' twice, 'and' once, 'it' once
    assert f[1]["n_stopwords"] == 4
    text = "the quick brown fox jumps over the lazy dog and it runs"
    mean = sum(len(w) for w in text.split(" ")) / 12
    assert f[1]["mean_word_len"] == pytest.approx(round(mean, 4))


def test_conjunction_requires_all_rules(docs):
    f = _flags(docs)
    for d in (2, 3, 4, 5, 6, 7):
        assert not f[d]["passes_gopher"]


def test_custom_stopword_list(docs):
    f = _flags(docs, stopwords=["zebra", "wombat"], min_stopwords=2)
    assert f[7]["rule_stopwords"] and f[7]["n_stopwords"] == 2
    assert not f[1]["rule_stopwords"]


def test_no_shuffle_plan(docs, spark):
    plan = gopher_quality_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
