"""Hashing-trick featurization (HashingVectorizer / Vowpal Wabbit).

The feature-hashing trick (Weinberger et al. 2009) turns unbounded
token vocabularies into FIXED d-dimensional vectors with no
dictionary: bucket = h1(token) mod d, contribution = ±1 by a second
hash bit (the signed variant that makes collisions unbiased), weight
= signed count. No vocabulary state means no driver-side fit pass and
no broadcast dictionary — the one featurizer that needs exactly ZERO
coordination at 100 TB, which is why linear classifiers over web-scale
text all use it.

Hashes are the portable ``md5_hash_pair`` family
(``functions/hashing.py``), so every bucket and sign replays exactly
in any SQL engine — the differential oracle checks the featurization
bit-for-bit.

The sparse relational form ``(id, bucket, weight)`` IS the output
contract (not an assembled array): downstream dot products and
cosine similarities are plain joins + aggregates over it, and it
round-trips through parquet/engines without array-format skew.

Scale shape: one narrow token projection + ONE (id, bucket) hash
aggregate with map-side partials; nothing but the sparse triples ever
shuffles, and d bounds the per-document output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.hashing import (
    md5_hash_pair,
)

__all__ = ["hashed_features"]


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: int = 64,
) -> DataFrame:
    """Signed hashed bag-of-words: ``(id, bucket, weight)`` sparse
    triples with ``bucket = h1(token) mod d`` and ``weight`` = the
    signed token count (sign = parity of h2 — collisions cancel in
    expectation). Zero-weight buckets (exact sign cancellation) are
    dropped, keeping the output truly sparse."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).where(F.col("_t") != "")
    h1, h2 = md5_hash_pair(F.col("_t"))
    sgn = F.when(h2 % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select(
            id_col,
            (h1 % d).alias("bucket"),
            sgn.alias("_s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").alias("weight"))
        .where(F.col("weight") != 0)
    )
