"""Content-defined chunking (operators/cdc.py): boundary determinism,
the shift-resistance property fixed-size blocking lacks, and the
dedup-stats profile."""

from computer_vision_foundations_spark.operators.cdc import (
    chunk_dedup_stats,
    content_chunks,
)

SHARED = "the common middle section appears verbatim in both documents here"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_text_exactly(spark):
    df = _df(spark, [(1, "prefix one " + SHARED + " suffix alpha")])
    rows = sorted(content_chunks(df, w=8, modulus=16).collect(),
                  key=lambda r: r.chunk_idx)
    assert rows[0].chunk_start == 1
    total = sum(r.chunk_len for r in rows)
    assert total == len("prefix one " + SHARED + " suffix alpha")
    # contiguous: each chunk starts where the previous ended
    for a, b in zip(rows, rows[1:]):
        assert b.chunk_start == a.chunk_start + a.chunk_len


def test_shared_region_chunks_identical_despite_shift(spark):
    """The CDC property: different-length prefixes do NOT desynchronize
    the shared region's chunk hashes (fixed-size blocks would)."""
    df = _df(
        spark,
        [
            (1, "prefix one " + SHARED + " suffix alpha"),
            (2, "a much longer and different opening text " + SHARED + " end"),
        ],
    )
    chunks = content_chunks(df, w=8, modulus=16).collect()
    h1 = {r.chunk_hash for r in chunks if r.doc_id == 1}
    h2 = {r.chunk_hash for r in chunks if r.doc_id == 2}
    assert len(h1 & h2) >= 2  # interior chunks of SHARED align


def test_dedup_stats_profile(spark):
    df = _df(
        spark,
        [
            (1, "prefix one " + SHARED + " suffix alpha"),
            (2, "different opening text " + SHARED + " other ending"),
            (3, "totally unrelated content nothing shared at all anywhere"),
        ],
    )
    out = {r.doc_id: r for r in chunk_dedup_stats(df, w=8, modulus=16).collect()}
    assert out[1].shared_chars > 0 and out[2].shared_chars > 0
    assert out[3].shared_chunks == 0 and out[3].dedup_fraction == 0.0
    assert 0 < out[1].dedup_fraction < 1


def test_identical_docs_fully_dedup(spark):
    df = _df(spark, [(1, SHARED), (2, SHARED)])
    out = chunk_dedup_stats(df, w=8, modulus=16).collect()
    for r in out:
        assert r.dedup_fraction == 1.0
        assert r.shared_chunks == r.n_chunks


def test_deterministic_and_partition_invariant(spark):
    rows = [(i, f"document number {i} with some shared trailing text " + SHARED)
            for i in range(20)]
    df = _df(spark, rows)
    a = sorted(map(tuple, chunk_dedup_stats(df).collect()))
    b = sorted(map(tuple, chunk_dedup_stats(df.repartition(7)).collect()))
    assert a == b
