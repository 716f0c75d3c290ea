"""Composition-level invariants of prepare_training_corpus."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.corpus import (
    prepare_training_corpus,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    rows = [
        (1, base + "alpha beta gamma delta"),
        (2, base + "alpha beta gamma delta"),          # exact dup of 1
        (3, base + "alpha beta gamma epsilon zeta"),   # near dup of 1
        (4, "completely different words entirely here repeated many times "
            "for a long enough document to survive the quality filter ok " * 2),
        (5, "too short"),                               # fails min_tokens
        (6, "!!! ??? $$$ %%% ^^^ &&& *** ((( ))) @@@ " * 8),  # punct junk
        (7, "contact me at someone@example.com please " * 6),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pipeline_invariants(spark):
    out = prepare_training_corpus(
        _docs(spark), min_tokens=20, max_punct_ratio=0.25,
        chunk_tokens=16, overlap=4, seq_len=48,
    )
    rows = out.collect()
    survivors = {r.doc_id for r in rows}
    # 5 (short) and 6 (punct) filtered; 2 exact-dups to 1; 3 near-dups to 1
    assert survivors == {1, 4, 7}
    # every chunk respects the token cap
    assert all(1 <= r.n_tokens <= 16 for r in rows)
    # redaction happened before chunking
    assert all("@example.com" not in r.chunk_text for r in rows)
    assert any("<EMAIL>" in r.chunk_text for r in rows if r.doc_id == 7)
    # every chunk starts within its bin's capacity
    assert all(0 <= r.offset < 48 for r in rows)
    # chunks of one doc stay ordered within their shard's bins
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        keys = [(r.bin, r.offset) for r in chunks]
        assert keys == sorted(keys)


def test_deterministic(spark):
    a = prepare_training_corpus(_docs(spark)).collect()
    b = prepare_training_corpus(_docs(spark)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_repetition_gate_drops_boilerplate(spark):
    """The optional Gopher-style repetition gates remove a degenerate
    repeated-token document that passes the length/punctuation gates,
    and leave the default (gates off) output unchanged."""
    from computer_vision_foundations_spark.operators.corpus import (
        prepare_training_corpus,
    )

    rows = [
        (1, " ".join(f"tok{i}" for i in range(40))),       # healthy
        (2, " ".join(["spam"] * 40)),                       # pure repetition
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    default = prepare_training_corpus(df, min_tokens=10, chunk_tokens=16, overlap=4)
    assert {r.doc_id for r in default.collect()} == {1, 2}
    gated = prepare_training_corpus(
        df, min_tokens=10, chunk_tokens=16, overlap=4, max_dup_token_frac=0.5
    )
    assert {r.doc_id for r in gated.collect()} == {1}


def test_decontamination_stage_drops_eval_overlap(spark):
    docs = _docs(spark)
    # eval doc = (almost) doc 4's text -> doc 4 must be dropped
    eval_df = spark.createDataFrame(
        [(100, "completely different words entirely here repeated many times "
               "for a long enough document to survive the quality filter ok")],
        ["doc_id", "text"],
    )
    out = prepare_training_corpus(
        docs, min_tokens=20, max_punct_ratio=0.25,
        chunk_tokens=16, overlap=4, seq_len=48,
        eval_df=eval_df, decontaminate_min_frac=0.5,
    )
    survivors = {r.doc_id for r in out.collect()}
    assert 4 not in survivors          # contaminated doc removed
    assert survivors == {1, 7}         # everything else unchanged


def test_domain_cap_and_surprisal_gate(spark):
    def body(i):  # distinct per doc so near-dup clustering keeps all
        words = [f"w{i}x{j}" for j in range(30)]
        return " ".join(words)

    rows = [(i, body(i), "srcA") for i in range(10)]
    rows += [(100 + i, body(100 + i), "srcB") for i in range(2)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = prepare_training_corpus(
        docs, min_tokens=10, max_punct_ratio=0.5,
        chunk_tokens=16, overlap=4, seq_len=48,
        domain_col="source", domain_cap=3,
    )
    survivors = {r.doc_id for r in out.collect()}
    assert len([d for d in survivors if d < 100]) <= 3   # srcA capped
    assert len([d for d in survivors if d >= 100]) == 2  # srcB under cap
    # a generous surprisal ceiling keeps everything; a tiny one empties
    full = prepare_training_corpus(
        docs, min_tokens=10, max_punct_ratio=0.5,
        chunk_tokens=16, overlap=4, seq_len=48, max_surprisal=50.0,
    )
    none = prepare_training_corpus(
        docs, min_tokens=10, max_punct_ratio=0.5,
        chunk_tokens=16, overlap=4, seq_len=48, max_surprisal=0.0,
    )
    assert full.count() > 0 and none.count() == 0


def test_span_and_dsir_gates_compose(spark):
    from computer_vision_foundations_spark.operators.corpus import (
        prepare_training_corpus,
    )

    boiler = "this exact boilerplate span repeats across many documents verbatim"
    rows = [(i, f"unique doc {i} content " + boiler) for i in range(6)]
    rows += [(100, "a genuinely original document with plenty of distinct words "
                   "to pass every quality filter easily " + " ".join(f"t{i}" for i in range(20)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = prepare_training_corpus(
        docs, min_tokens=5, chunk_tokens=16, overlap=0, seq_len=64, n_shards=4
    )
    gated = prepare_training_corpus(
        docs, min_tokens=5, chunk_tokens=16, overlap=0, seq_len=64, n_shards=4,
        max_dup_span_frac=0.5, span_n=6,
    )
    base_docs = {r.doc_id for r in base.select("doc_id").distinct().collect()}
    gated_docs = {r.doc_id for r in gated.select("doc_id").distinct().collect()}
    # the boilerplate-dominated docs are dropped by the span gate...
    assert gated_docs < base_docs
    # ...but the original document survives
    assert 100 in gated_docs

    target = spark.createDataFrame(
        [(999, "genuinely original document with distinct words")],
        "doc_id long, text string",
    )
    dsir_gated = prepare_training_corpus(
        docs, min_tokens=5, chunk_tokens=16, overlap=0, seq_len=64, n_shards=4,
        dsir_target=target, dsir_min_weight=0.0,
    )
    dsir_docs = {r.doc_id for r in dsir_gated.select("doc_id").distinct().collect()}
    assert 100 in dsir_docs  # target-like doc kept
