"""Lexical diversity indices per corpus slice.

The mixture family weighs domains by VOLUME (operators/mixture.py) and
by DIVERGENCE (operators/divergence.py); this operator measures each
slice's internal variety — is a source a thousand near-identical
boilerplate pages or a genuinely diverse crawl? Three standard
ecology-borrowed indices over the slice's unigram distribution:

- Shannon entropy ``H = −Σ p·ln p`` (nats) — the token-level
  information rate, the same number a compression-based quality
  filter bounds;
- normalized entropy ``H / ln |V_slice|`` ∈ [0, 1] — comparable
  across slices with different vocabularies;
- Simpson index ``Σ p²`` — the probability two random tokens
  coincide (1/Simpson is the "effective vocabulary size").

Spark-first shape: one token-stream hash aggregate to (group, token)
counts, one group aggregate of the index sums — the token stream
shuffles once, outputs are |groups| rows. All in codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "group_diversity",
    "diversity_oracle_sql",
    "doc_char_entropy",
    "char_entropy_oracle_sql",
    "lexical_richness",
    "richness_oracle_sql",
]


def group_diversity(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """``(grp, n_toks, n_vocab, entropy, norm_entropy, simpson)`` per
    group — floats rounded to 6."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("grp", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    p = F.col("c").cast("double") / F.col("n_toks")
    return (
        counts.withColumn(
            "n_toks", F.sum("c").over(Window.partitionBy("grp"))
        )
        .groupBy("grp")
        .agg(
            F.max("n_toks").alias("n_toks"),
            F.count(F.lit(1)).alias("n_vocab"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(
                F.when(
                    F.count(F.lit(1)) > 1,
                    -F.sum(p * F.log(p))
                    / F.log(F.count(F.lit(1)).cast("double")),
                ),
                6,
            ).alias("norm_entropy"),
            F.round(F.sum(p * p), 6).alias("simpson"),
        )
        .orderBy("grp")
    )


def diversity_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB twin — identical index algebra."""
    return f"""
    WITH toks AS (
        SELECT {group_col} AS grp,
               unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}
    ), t AS (
        SELECT * FROM toks WHERE tok <> ''
    ), counts AS (
        SELECT grp, tok, count(*) AS c FROM t GROUP BY 1, 2
    ), withn AS (
        SELECT grp, c,
               sum(c) OVER (PARTITION BY grp) AS n_toks
        FROM counts
    )
    SELECT grp, CAST(max(n_toks) AS BIGINT) AS n_toks, count(*) AS n_vocab,
           round(-sum((c / CAST(n_toks AS DOUBLE))
                      * ln(c / CAST(n_toks AS DOUBLE))), 6) AS entropy,
           round(CASE WHEN count(*) > 1 THEN
                     -sum((c / CAST(n_toks AS DOUBLE))
                          * ln(c / CAST(n_toks AS DOUBLE)))
                     / ln(CAST(count(*) AS DOUBLE))
                 END, 6) AS norm_entropy,
           round(sum((c / CAST(n_toks AS DOUBLE))
                     * (c / CAST(n_toks AS DOUBLE))), 6) AS simpson
    FROM withn GROUP BY grp ORDER BY grp
    """


def doc_char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, n_chars_m, char_entropy)`` per document — Shannon
    entropy (nats) of the CHARACTER distribution, the junk detector
    the per-slice token indices can't give: binary blobs and
    keyboard-mash score far from prose (English text ≈ 2.9–3.1 nats),
    constant-fill padding scores ≈ 0. Rounded 6.

    Scale shape: the character stream shuffles once into
    (id, char) counts; one per-doc aggregate. All codegen."""
    chars = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).where(F.col("ch") != "")
    counts = chars.groupBy("id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = Window.partitionBy("id")
    p = F.col("c").cast("double") / F.sum("c").over(tot)
    return (
        counts.withColumn("p", p)
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_chars_m"),
            F.round(
                -F.sum(F.col("p") * F.log("p")), 6
            ).alias("char_entropy"),
        )
        .orderBy("id")
    )


def char_entropy_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`doc_char_entropy`."""
    return f"""
    WITH chars AS (
        SELECT {id_col} AS id,
               unnest(string_split({text_col}, '')) AS ch
        FROM {table}
    ), c AS (
        SELECT * FROM chars WHERE ch <> ''
    ), counts AS (
        SELECT id, ch, count(*) AS c FROM c GROUP BY 1, 2
    ), withp AS (
        SELECT id, c,
               c / CAST(sum(c) OVER (PARTITION BY id) AS DOUBLE) AS p
        FROM counts
    )
    SELECT id, CAST(sum(c) AS BIGINT) AS n_chars_m,
           round(-sum(p * ln(p)), 6) AS char_entropy
    FROM withp GROUP BY id ORDER BY id
    """


def lexical_richness(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """``(grp, n_toks, n_vocab, hapax_ratio, yule_k)`` per group —
    the lexical-richness pair corpus linguists report next to entropy:
    ``hapax_ratio`` = fraction of vocabulary seen exactly once (high
    in natural text, near-zero in template spam), and Yule's K
    ``= 10⁴·(Σ_r r²·V_r − N) / N²`` over the frequency spectrum
    (repetition-heavy text scores high; K is length-robust where
    type-token ratios are not). Rounded 6.

    Scale shape: one token-stream shuffle into (grp, token) counts,
    one frequency-spectrum aggregate — the same budget as
    :func:`group_diversity`."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("grp", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("grp")
        .agg(
            F.sum("c").alias("n_toks"),
            F.count(F.lit(1)).alias("n_vocab"),
            F.round(
                F.sum(
                    F.when(F.col("c") == 1, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
            F.round(
                F.lit(10_000.0)
                * (
                    F.sum(F.col("c") * F.col("c")) - F.sum("c")
                ).cast("double")
                / (F.sum("c") * F.sum("c")).cast("double"),
                6,
            ).alias("yule_k"),
        )
        .orderBy("grp")
    )


def richness_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB twin of :func:`lexical_richness`."""
    return f"""
    WITH toks AS (
        SELECT {group_col} AS grp,
               unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}
    ), t AS (
        SELECT * FROM toks WHERE tok <> ''
    ), counts AS (
        SELECT grp, tok, count(*) AS c FROM t GROUP BY 1, 2
    )
    SELECT grp, CAST(sum(c) AS BIGINT) AS n_toks,
           count(*) AS n_vocab,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS hapax_ratio,
           round(10000.0 * CAST(sum(c * c) - sum(c) AS DOUBLE)
                 / CAST(sum(c) * sum(c) AS DOUBLE), 6) AS yule_k
    FROM counts GROUP BY grp ORDER BY grp
    """
