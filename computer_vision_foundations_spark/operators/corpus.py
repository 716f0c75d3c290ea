"""End-to-end training-corpus preparation — the flagship composition.

Everything between "raw scraped documents" and "packed training
sequences", chained from the individually oracle-verified operators:

    quality filter → exact dedup → near-dup clustering → redaction
    → chunking → sequence packing

Each arrow is one of the engine's tested operators (q22, q21,
q26+q48, q57, q56, q58); this module only supplies the glue and the
composition-level invariants (tests/test_corpus.py): no two surviving
chunks descend from documents in the same near-dup cluster, every
chunk fits ``chunk_tokens``, every packed bin starts within
``seq_len``.

Shuffle budget of the whole pipeline, in order: one 16-byte-key hash
agg (exact dedup), one banded equi-join + a few label-table rounds
(near-dup), zero (redact), zero (chunk — row-local Generate), one
(pack). Document BODIES move through exactly two narrow projections
and are never a shuffle key.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.hashing import md5_hash_pair
from computer_vision_foundations_spark.functions.text import (
    quality_columns,
    repetition_columns,
)
from computer_vision_foundations_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
    redact_text,
)
from computer_vision_foundations_spark.operators.components import dedup_clusters
from computer_vision_foundations_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidate_pairs,
)

__all__ = ["prepare_training_corpus"]


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.25,
    max_dup_token_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    chunk_tokens: int = 32,
    overlap: int = 8,
    seq_len: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Raw documents → packed training chunks.

    Returns ``(doc_id, chunk_idx, chunk_text, n_tokens, shard, bin,
    offset)`` — deduplicated, redacted, chunked, and greedily packed
    into ~``seq_len``-token bins per shard. Near-duplicate clusters
    keep only their smallest doc_id (same keep-min policy as exact
    dedup), so the output provenance is deterministic."""
    # 1. quality gate (all-Catalyst score columns, one projection);
    # optional Gopher-style repetition gates ride the same scan
    scored = quality_columns(df, text_col)
    cond = (F.col("n_tokens") >= min_tokens) & (
        F.col("punct_ratio") <= max_punct_ratio
    )
    if max_dup_token_frac is not None or max_top_bigram_frac is not None:
        scored = repetition_columns(scored, text_col)
        if max_dup_token_frac is not None:
            cond = cond & (F.col("dup_token_frac") <= max_dup_token_frac)
        if max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    kept = scored.filter(cond).select(id_col, text_col)

    # 2. exact dedup: keep each distinct content's min id
    keepers = exact_duplicates(kept, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = kept.join(keepers, id_col, "left_semi")
    # The filtered+exact-deduped corpus feeds BOTH the LSH candidate
    # pipeline (inside which connected components re-reads it across
    # label rounds) and the final anti-join — persist so the
    # scan→quality→dedup prefix runs once, not per consumer (measured
    # 31.8 s → see bench: the recompute dominated the composition).
    kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
    kept.count()  # eager: consumers inside one job race cache population

    # 3. near-dup clusters -> drop everything but the canonical doc
    pairs = minhash_lsh_candidate_pairs(
        kept, text_col, id_col, k=3, n_hashes=8, bands=4,
        repartition_to=df.sparkSession.sparkContext.defaultParallelism,
    )
    losers = (
        dedup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    kept = kept.join(F.broadcast(losers), id_col, "left_anti")

    # 4-5. redact, then chunk (both row-local)
    clean = redact_text(kept, text_col)
    chunks = chunk_documents(
        clean, text_col, id_col, chunk_tokens=chunk_tokens, overlap=overlap
    )

    # 6. pack chunks into training bins; composite int id keeps the
    # within-shard order deterministic (doc, then chunk position)
    chunks = chunks.withColumn(
        "_chunk_id", F.col(id_col) * 10_000 + F.col("chunk_idx")
    )
    h1, _ = md5_hash_pair(F.col(id_col).cast("string"))
    packed = pack_sequences(
        chunks,
        "n_tokens",
        id_col="_chunk_id",
        seq_len=seq_len,
        shard_col=h1 % n_shards,
    )
    return packed.select(
        id_col, "chunk_idx", "chunk_text", "n_tokens", "shard", "bin", "offset"
    )
