"""Distributed BPE training vs a pure-Python reference implementation
(same tie-breaks), plus encode/train consistency."""

from collections import Counter

from computer_vision_foundations_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    bpe_word_counts,
)


def _reference_bpe(texts, n_merges, min_pair_count=2):
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties lexicographic on (a, b) ascending
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer lowest wide wide",
]


def test_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = bpe_train(df, n_merges=12)
    exp = _reference_bpe(TEXTS, n_merges=12)
    assert got == exp
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_word_counts(spark):
    df = spark.createDataFrame([(1, "a b a  a")], "doc_id long, text string")
    got = {r.word: r.cnt for r in bpe_word_counts(df).collect()}
    assert got == {"a": 3, "b": 1}  # empty splits dropped


def test_encode_applies_learned_merges(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    merges = bpe_train(df, n_merges=12)
    enc = bpe_encode(df, merges, out_col="toks")
    rows = {r.doc_id: r.toks for r in enc.collect()}
    # round-trip: concatenating tokens of each word restores the text
    for i, t in enumerate(TEXTS):
        assert "".join(rows[i]) == t.replace(" ", "")
    # frequent whole words should have become single tokens
    flat = [tok for toks in rows.values() for tok in toks]
    assert "low" in flat
    # encode with no merges = characters
    chars = bpe_encode(df, [], out_col="toks").collect()[0].toks
    assert all(len(c) == 1 for c in chars)


def test_train_greedy_overlap_semantics(spark):
    # round-12: overlapping pairs ("aaaa" — greedy non-overlapping
    # merge), merges that CREATE the next argmax pair, and pairs whose
    # count drops to exactly zero, all checked against the pure-Python
    # reference. Added while evaluating an incremental pair-count
    # variant (measured slower and reverted — see OPTIMIZATION_r12.md);
    # kept because it pins the trickiest merge semantics either
    # implementation must honor.
    texts = ["aaaa aaa aa", "abab ab ab", "aabb aabb ba", "baaa aab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    assert bpe_train(df, n_merges=10) == _reference_bpe(texts, n_merges=10)


def test_train_early_stop(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once -> below min_pair_count=2 -> no merges
    assert bpe_train(df, n_merges=5) == []
