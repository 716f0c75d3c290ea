"""Text-analysis column functions for training-data pipelines.

Everything here is built from native Catalyst expressions (split,
higher-order array functions, regexp) so it runs JVM-side with
whole-stage codegen — no Python in the hot path. These are the
text-quality / tokenization / fingerprint primitives a 100 TB document
pipeline needs (north-star extensions, SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately tiny and deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (single-separator split, JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def token_count(text: Column | str, sep: str = " ") -> Column:
    return F.size(tokens(text, sep))


def normalized_text(text: Column | str) -> Column:
    """Lowercase + strip non-alphanumerics: canonical form for dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")


def fingerprint_md5(text: Column | str) -> Column:
    """Deterministic 128-bit document fingerprint of the canonical text."""
    return F.md5(normalized_text(text).cast("binary"))


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in ``stopwords`` (0 for empty docs)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, n_sw.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles from a token-array column.

    Built as a ``zip_with`` fold over k shifted slices of the token
    array — each zip lambda touches only its lambda variables, so the
    per-element work is one string concat. The earlier
    ``transform(sequence(...), i -> array_join(slice(toks,i,k)))`` form
    is semantically identical but catastrophically slower once the
    expression is inlined under a Generate (explode): Catalyst's
    CollapseProject inlines a once-referenced token ``split`` into the
    per-element lambda, re-splitting the document per shingle —
    O(tokens²) per document, measured ~100× slower at sf0.1.

    ``toks`` should still be a materialized column (its own projection):
    the k slice references keep CollapseProject from inlining an
    expensive upstream expression. Documents shorter than k tokens
    produce one whole-doc shingle.
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    m = n - F.lit(k - 1)  # shingle count when n >= k

    sh = F.slice(toks, k, m)
    for i in range(k - 1, 0, -1):
        sh = F.zip_with(
            F.slice(toks, i, m), sh, lambda x, y: F.concat(x, F.lit("|"), y)
        )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.array_join(toks, "|"))
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Single-expression shingles from raw text.

    Convenience form for small frames / tests; hot paths should
    two-step it (``tokens`` projection, then ``shingles_from_tokens``)
    — see that function's note.
    """
    return shingles_from_tokens(tokens(text), k)


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add standard quality-score columns for document filtering.

    - n_tokens: whitespace token count
    - n_chars_measured: character length
    - avg_token_len: mean token length
    - punct_ratio: punctuation chars / total chars
    - en_stopword_ratio: fraction of tokens in a small English stopword set
    """
    c = F.col(text_col)
    n_tok = token_count(c)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_measured", F.length(c))
        .withColumn(
            "avg_token_len",
            F.when(
                n_tok > 0,
                (F.length(c) - (n_tok - F.lit(1))).cast("double") / n_tok,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(c) > 0,
                (
                    F.length(c) - F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
                ).cast("double")
                / F.length(c),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("en_stopword_ratio", stopword_ratio(c, STOPWORDS["en"]))
    )


def language_score_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap score per candidate language + argmax guess.

    A deterministic, SQL-expressible language-ID heuristic: for each
    language, the fraction of tokens in that language's stopword list;
    ``lang_guess`` is the language with the highest score ('und' if all
    scores are zero). Ties resolve by language-code order.
    """
    out = df
    for lang, words in sorted(STOPWORDS.items()):
        out = out.withColumn(f"score_{lang}", stopword_ratio(F.col(text_col), words))
    scores = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scores)
    out = out.withColumn(
        "lang_guess",
        F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
            F.lit("und")
        ),
    )
    return out
