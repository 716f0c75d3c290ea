"""Text-analysis column functions (SURVEY §2.10)."""

import math

from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.text import (
    fingerprint_md5,
    normalized_text,
    quality_columns,
    language_score_columns,
    word_shingles,
)


def test_word_shingles_known(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    [row] = df.select(word_shingles("text", 3).alias("s")).collect()
    assert sorted(row.s) == ["a|b|c", "b|c|d"]


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    [row] = df.select(word_shingles("text", 3).alias("s")).collect()
    assert row.s == ["one|two"]  # docs shorter than k → whole-doc shingle


def test_normalization_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello world",)], ["text"]
    )
    out = df.select(
        normalized_text("text").alias("n"), fingerprint_md5("text").alias("fp")
    ).collect()
    assert out[0].n == "hello world" == out[1].n
    assert out[0].fp == out[1].fp


def test_quality_columns_values(spark):
    df = spark.createDataFrame([("the cat sat!",)], ["text"])
    row = quality_columns(df, "text").collect()[0]
    assert row.n_tokens == 3
    assert row.n_chars_measured == 12
    # 10 non-space chars over 3 tokens
    assert math.isclose(row.avg_token_len, 10 / 3)
    assert math.isclose(row.punct_ratio, 1 / 12)
    assert math.isclose(row.en_stopword_ratio, 1 / 3)


def test_language_guess(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is big"),
            (2, "el gato es un animal que vive en la casa"),
            (3, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_guess for r in language_score_columns(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_repetition_columns(spark):
    """Gopher repetition fractions against hand counts."""
    from computer_vision_foundations_spark.functions.text import (
        repetition_columns,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 1 distinct of 4; bigrams: 'a a' x3
            (2, "w x y z"),          # no repetition at all
            (3, "a b a b a"),        # bigrams: 'a b' x2, 'b a' x2
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (
            r.dup_token_frac, r.top_token_frac,
            r.dup_bigram_frac, r.top_bigram_frac,
        )
        for r in repetition_columns(df).collect()
    }
    assert got[1] == (0.75, 1.0, round(2 / 3, 6), 1.0)
    assert got[2] == (0.0, 0.25, 0.0, round(1 / 3, 6))
    assert got[3] == (0.6, 0.6, 0.5, 0.5)


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "the the rare zyx"), (3, "the qqq")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.surprisal for r in unigram_logprob_scores(docs).collect()}
    # doc of only the commonest token is least surprising
    assert out[1] < out[2] < out[3] or out[1] < out[3]
    assert out[1] < out[2]


def test_unigram_surprisal_external_model_and_oov(spark):
    import math

    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_frequencies,
        unigram_logprob_scores,
    )

    ref = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string"
    )
    freq = unigram_frequencies(ref)  # a:3, b:1, N=4
    probe = spark.createDataFrame([(9, "a b zzz")], "doc_id long, text string")
    row = unigram_logprob_scores(
        probe, freq_df=freq, alpha=1.0
    ).collect()[0]
    exp = -(math.log2(3 / 4) + math.log2(1 / 4) + math.log2(1 / 4)) / 3
    assert row.n_tokens == 3
    assert abs(row.surprisal - exp) < 1e-9


def test_bigram_surprisal_matches_hand_computation(spark):
    import math

    from computer_vision_foundations_spark.operators.perplexity import (
        bigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a b b")], "doc_id long, text string"
    )
    lam = 0.75
    # corpus: tokens a,b,a,b,a,a,b,b -> uni: a=4,b=4, N=8
    # bigrams: (a,b)x2,(b,a)x1,(a,a)x1,(b,b)x1 + doc2 (a,a)? recount:
    # doc1 pairs: ab, ba, ab; doc2 pairs: aa, ab?? no: a a b b -> aa, ab, bb
    # bi: ab:3, ba:1, aa:1, bb:1 ; pcnt: a->4 (ab3+aa1), b->2 (ba1+bb1)
    p_uni = {"a": 4 / 8, "b": 4 / 8}
    bi = {("a", "b"): 3, ("b", "a"): 1, ("a", "a"): 1, ("b", "b"): 1}
    pcnt = {"a": 4, "b": 2}

    def p(tok, prev):
        if prev is None:
            return p_uni[tok]
        return lam * bi.get((prev, tok), 0) / pcnt[prev] + (1 - lam) * p_uni[tok]

    def doc_score(toks):
        ps = [p(t, None if i == 0 else toks[i - 1]) for i, t in enumerate(toks)]
        return -sum(math.log2(x) for x in ps) / len(ps)

    out = {
        r.doc_id: r for r in bigram_logprob_scores(docs, lam=lam).collect()
    }
    assert out[1].n_tokens == 4
    assert abs(out[1].surprisal - doc_score(["a", "b", "a", "b"])) < 1e-9
    assert abs(out[2].surprisal - doc_score(["a", "a", "b", "b"])) < 1e-9


def test_bigram_surprisal_ranks_shuffled_text_higher(spark):
    from computer_vision_foundations_spark.operators.perplexity import (
        bigram_logprob_scores,
    )

    # doc 3 breaks the dominant a->b transition pattern of the corpus
    rows = [(i, "a b " * 20) for i in range(10)] + [(99, "b b a a b a a a")]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = {r.doc_id: r.surprisal for r in bigram_logprob_scores(docs).collect()}
    assert out[99] > out[0]


def test_kneser_ney_matches_hand_computation(spark):
    import math

    from computer_vision_foundations_spark.operators.perplexity import (
        kneser_ney_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a b b")], "doc_id long, text string"
    )
    d = 0.75
    # uni: a=4,b=4, N=8; bi: ab:3, ba:1, aa:1, bb:1
    # pcnt: a->4, b->2; fanout: a->2 (ab,aa), b->2 (ba,bb)
    # cont: a<-{b,a} ccnt=2; b<-{a,b} ccnt=2; n_bigrams(distinct)=4
    p_uni = {"a": 4 / 8, "b": 4 / 8}
    bi = {("a", "b"): 3, ("b", "a"): 1, ("a", "a"): 1, ("b", "b"): 1}
    pcnt = {"a": 4.0, "b": 2.0}
    fanout = {"a": 2.0, "b": 2.0}
    p_cont = {"a": 2 / 4, "b": 2 / 4}

    def p(tok, prev):
        if prev is None:
            return p_uni[tok]
        return (
            max(bi.get((prev, tok), 0) - d, 0.0) / pcnt[prev]
            + d * fanout[prev] / pcnt[prev] * p_cont[tok]
        )

    def doc_score(toks):
        ps = [p(t, None if i == 0 else toks[i - 1]) for i, t in enumerate(toks)]
        return -sum(math.log2(x) for x in ps) / len(ps)

    out = {
        r.doc_id: r
        for r in kneser_ney_logprob_scores(docs, discount=d).collect()
    }
    assert out[1].n_tokens == 4
    assert abs(out[1].surprisal - doc_score(["a", "b", "a", "b"])) < 1e-9
    assert abs(out[2].surprisal - doc_score(["a", "a", "b", "b"])) < 1e-9


def test_kneser_ney_downweights_frozen_collocations(spark):
    from computer_vision_foundations_spark.operators.perplexity import (
        kneser_ney_logprob_scores,
    )

    # "francisco" is frequent but only ever follows "san"; "the" is as
    # frequent and follows many contexts. After an UNSEEN bigram
    # (prev="new"), KN's continuation backoff must prefer "the".
    corpus = [(i, "san francisco the city the bay new start") for i in range(6)]
    probe_the = (99, "new the")
    probe_fr = (98, "new francisco")
    docs = spark.createDataFrame(
        corpus + [probe_the, probe_fr], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.surprisal
        for r in kneser_ney_logprob_scores(docs).collect()
    }
    # lower surprisal = higher probability for the productive token
    assert out[99] < out[98]
