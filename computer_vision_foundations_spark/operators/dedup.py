"""Deduplication operators for large-scale training-data pipelines.

North-star extensions (SURVEY §2.10): exact dedup, n-gram Jaccard
near-dup, MinHash(+LSH), SimHash, and embedding-cosine near-dup. All
operators are DataFrame-in/DataFrame-out, shuffle-aware, seeded, and
never collect to the driver:

- exact:        one hash-aggregate on the canonical text (map-side
                partial agg; the 100 TB plan is a single shuffle on
                fingerprint, not on the raw text).
- n-gram/Jaccard: explode distinct shingles → self-join on shingle →
                count common → Jaccard. The shingle join is the
                textbook plan; hot shingles are the skew risk, so
                ``max_shingle_freq`` drops stop-shingles (standard
                trick: a shingle appearing in thousands of docs
                contributes no discriminative signal but quadratic
                join fan-out).
- MinHash+LSH:  signature = per-seed min over shingle hashes (JVM-side,
                functions/hashing.py), bands of r rows → candidate
                pairs join on (band_index, band_signature). Turns the
                quadratic all-pairs problem into an equi-join — the
                scale path.
- SimHash:      64-bit fingerprint from per-token hash bit votes; near
                dups = small Hamming distance.
- embedding:    cosine over ``array<float>`` with a blocking column to
                bound the pair count (all-pairs within a block); at
                100 TB block on an LSH bucket / coarse quantizer id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.hashing import minhash_column
from computer_vision_foundations_spark.functions.text import (
    fingerprint_md5,
    shingles_from_tokens,
    tokens,
)
from computer_vision_foundations_spark.functions.vectors import cosine_similarity


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    canonicalize: bool = True,
) -> DataFrame:
    """Group exact duplicates; keep min-id representative per group.

    Returns ``(fingerprint, keep_id, n_dupes)`` — one row per distinct
    content. A single hash aggregate over the md5 fingerprint: the
    shuffle carries 16-byte keys, never the document bodies.
    """
    fp = fingerprint_md5(text_col) if canonicalize else F.md5(F.col(text_col).cast("binary"))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def _with_shingles(
    df: DataFrame, text_col: str, id_col: str, id_alias: str, k: int
) -> DataFrame:
    """(id, _shingles) via two projections: tokens, then shingles.

    The intermediate token-array projection is load-bearing — see
    ``shingles_from_tokens``: an inline ``split`` inside the shingle
    lambda is re-evaluated per element (O(tokens²)/doc). The token
    attribute is referenced twice by the shingle expression (size bound
    + slice), so CollapseProject keeps the projections separate.
    """
    tokenized = df.select(
        F.col(id_col).alias(id_alias), tokens(text_col).alias("_toks")
    )
    return tokenized.select(
        id_alias, shingles_from_tokens("_toks", k).alias("_shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs by word-k-gram Jaccard similarity.

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b and
    jaccard >= threshold. Plan: distinct-shingle explode → self-equi-join
    on shingle → count common → |A|+|B|-common. Only pairs sharing ≥1
    shingle are ever materialized, so cost is driven by shingle
    document-frequency, which ``max_shingle_freq`` caps against skew.
    """
    shingled = _with_shingles(df, text_col, id_col, "_id", k).withColumn(
        "_size", F.size("_shingles")
    )

    exploded = shingled.select(
        "_id", "_size", F.explode("_shingles").alias("_shingle")
    )
    if max_shingle_freq is not None:
        freq_ok = (
            exploded.groupBy("_shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_freq)
            .select("_shingle")
        )
        exploded = exploded.join(freq_ok, "_shingle")

    a = exploded.select(
        F.col("_id").alias("id_a"), F.col("_size").alias("size_a"), "_shingle"
    )
    b = exploded.select(
        F.col("_id").alias("id_b"), F.col("_size").alias("size_b"), "_shingle"
    )
    pairs = (
        a.join(b, "_shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document MinHash signature: ``(id, signature array<n_hashes>)``.

    Entirely map-side (no shuffle): shingle + hash + per-seed min are
    all Catalyst array expressions. The shingle array is materialized
    in its own projection: inlining it into all ``n_hashes`` transform
    lambdas makes Catalyst duplicate the (expensive) shingling
    expression per hash — measured >100× slower. CollapseProject keeps
    the two-step form intact because the shingle expression is
    non-cheap and referenced multiple times.
    """
    shingled = _with_shingles(df, text_col, id_col, "doc_id", k)
    return shingled.select(
        "doc_id",
        minhash_column(F.col("_shingles"), n_hashes, hash_fn).alias("signature"),
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH banding: pairs agreeing on ≥1 full band of the signature.

    ``n_hashes`` must divide into ``bands`` equal rows. Each doc emits
    ``bands`` (band_idx, band_key) rows; candidates are an equi-join on
    the band key — linear in docs + join fan-out on genuinely similar
    buckets, never quadratic. Output: distinct ``(id_a, id_b)``.
    """
    assert n_hashes % bands == 0, "bands must divide n_hashes"
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k, n_hashes, hash_fn)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.array_join(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                        ",",
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_from_hashes(hashes: Column | str, bits: int = 32) -> Column:
    """SimHash from a precomputed ``array<long>`` of token hashes.

    Each output bit is the majority vote of the corresponding hash bit.
    Prefer computing the hash array in its own projection first (see
    ``simhash_column`` note) so the ``bits``-fold fan-out below reuses
    one materialized array instead of re-hashing per bit.
    """
    hashes = F.col(hashes) if isinstance(hashes, str) else hashes
    n = F.size(hashes)
    # single-parameter lambdas only: a second parameter would be bound
    # to the array index by PySpark's higher-order-function protocol
    def _bit_test(i: int):
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    bit_cols = []
    for i in range(bits):
        ones = F.size(F.filter(hashes, _bit_test(i)))
        bit_cols.append(
            F.when(ones * 2 >= n, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for bc in bit_cols[1:]:
        out = out + bc
    return out


def simhash_column(
    text_col: Column | str, bits: int = 32, token_sep: str = " "
) -> Column:
    """SimHash fingerprint of the token set, as a ``bits``-wide long.

    Convenience single-expression form; Catalyst inlines the token
    hashing into every bit vote, so for hot paths materialize
    ``transform(array_distinct(split(text)), xxhash64)`` in a
    projection and use ``simhash_from_hashes`` (the
    q31 registry entry does this). Near-duplicates are pairs with
    small Hamming distance (``bit_count(a ^ b)``).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    hashes = F.transform(F.array_distinct(F.split(c, token_sep)), lambda t: F.xxhash64(t))
    return simhash_from_hashes(hashes, bits)


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicate pairs ``(id_a, id_b, cos_sim)``, id_a < id_b.

    With ``block_col`` the self-join is an equi-join within blocks
    (at scale: LSH bucket / IVF cell id); without it, a full cross
    product — only for small frames or after candidate generation.
    """
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
    )
    joined = (
        left.join(right, on="_blk") if block_col else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn("cos_sim", cosine_similarity("_va", "_vb"))
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
