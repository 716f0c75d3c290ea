"""Feature hashing (the hashing trick) with a collision audit.

Weinberger et al. 2009 ("Feature Hashing for Large Scale Multitask
Learning"): map each token to a fixed-width feature index
``h(token) mod D`` with a ±1 sign hash so colliding tokens cancel in
expectation rather than pile up. This is how a training pipeline
featurizes unbounded vocabularies at 100 TB without building (or
broadcasting) a vocabulary at all — the featurizer is stateless, so
it needs no fit pass, no dictionary shuffle, and every executor maps
tokens identically.

Determinism contract: index and sign derive from the engine's
portable md5 convention — index = 28-bit slice (hex chars 1-7) mod D,
sign = parity of hex char 8 — so any engine reproduces the exact
featurization (the DuckDB oracle replays it verbatim).

Spark-first shape: tokenize (split, JVM codegen) → explode →
ONE (token)-keyed aggregate to vocabulary-sized rows → per-index
stats over |vocab| rows. Document bodies never shuffle; the only
data-sized stage is the narrow token explode feeding a
map-side-combinable count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_feature_audit", "feature_hash_oracle_sql"]


def hashed_feature_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
    seed: int = 5,
) -> DataFrame:
    """Per-feature-index audit of the hashing trick at width ``dim``:

    ``(feat, n_tokens, n_occurrences, signed_sum)`` — how many
    DISTINCT tokens collide into each index, their total occurrence
    count, and the ±1-signed occurrence sum (small |signed_sum| with
    large n_occurrences = the cancellation working as designed).
    Exactly the table you inspect before choosing D for a corpus.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    # vocabulary-sized reduction FIRST (map-side combinable), then hash
    # the |vocab| distinct tokens once each — not once per occurrence
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col("tok")).cast("binary"))
    feat = (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % dim
    ).alias("feat")
    sign = F.when(
        F.conv(F.substring(h, 8, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        vocab.select(feat, "cnt", sign.alias("sign"))
        .groupBy("feat")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("n_occurrences"),
            F.sum(F.col("sign") * F.col("cnt")).alias("signed_sum"),
        )
        .orderBy("feat")
    )


def feature_hash_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    seed: int = 5,
) -> str:
    """DuckDB twin — identical tokenization, md5 slices, mod-D index
    and parity sign."""
    return f"""
    WITH toks AS (
        SELECT {id_col} AS doc, t.tok AS tok
        FROM {table},
             unnest(string_split_regex(lower({text_col}), '\\s+')) t(tok)
        WHERE t.tok <> ''
    ), vocab AS (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), hashed AS (
        SELECT CAST(('0x' || substr(md5('{seed}|' || tok), 1, 7))
                    AS BIGINT) % {dim} AS feat,
               cnt,
               CASE WHEN CAST(('0x' || substr(md5('{seed}|' || tok), 8, 1))
                          AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sign
        FROM vocab
    )
    SELECT feat,
           count(*) AS n_tokens,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           CAST(sum(sign * cnt) AS BIGINT) AS signed_sum
    FROM hashed GROUP BY feat ORDER BY feat
    """
