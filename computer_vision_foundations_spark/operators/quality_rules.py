"""Gopher-style document quality rules (rule-based corpus filtering).

Rule-based quality filtering is the first gate of every large-scale
text pipeline (Gopher, Rae et al. 2021, appendix A; reused by
MassiveText, RefinedWeb and FineWeb): cheap, deterministic predicates
over surface statistics that drop boilerplate, navigation junk and
machine-generated spam before any model-based scoring runs. The rule
set implemented here is the published Gopher battery:

1. word count within ``[min_words, max_words]``
2. mean word length within ``[min_mean_word_len, max_mean_word_len]``
3. symbol-to-word ratio (``#`` and ``...``) below ``max_symbol_ratio``
4. fraction of lines starting with a bullet below ``max_bullet_ratio``
5. fraction of lines ending with an ellipsis below ``max_ellipsis_ratio``
6. fraction of words containing an alphabetic char at least
   ``min_alpha_word_ratio``
7. at least ``min_stopwords`` stopword hits

Every statistic AND every per-rule flag is emitted, not just the
conjunction — downstream mixture/reporting operators consume the
individual flags (which rule fired where is the standard corpus-QA
report). Reference parity: the reference gates training inputs by
metadata predicates before featurization (`03_Model Training.py`
label/size filters); this is the text-corpus generalization.

Scale shape: one narrow projection — every rule is a Catalyst
expression over ``split()`` arrays (higher-order functions, no UDF,
no explode), so the whole battery runs inside WholeStageCodegen with
ZERO shuffles and nothing but the flag row leaving the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_quality_flags", "DEFAULT_STOPWORDS"]

# the published rule uses a small English function-word list; any hit
# counts (the rule is "has at least 2 stopwords", not a ratio)
DEFAULT_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in", "is", "it"]


def _mean_word_len(toks: Column, n_words: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return total / F.greatest(n_words, F.lit(1))


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document surface statistics + one boolean per Gopher rule +
    the conjunction ``passes_gopher``.

    Words are whitespace tokens, lines split on ``\\n``; both are kept
    deliberately simple so the DuckDB oracle replays them exactly.
    Ratios are rounded to 6 and the mean word length to 4 digits —
    flags are computed on the UNROUNDED values (rounding is only for
    cross-engine display parity; both engines derive flags from the
    same exact integer counts, so flags can never disagree with their
    displayed statistic by more than the display rounding)."""
    sw = stopwords if stopwords is not None else DEFAULT_STOPWORDS
    sw_lit = F.array(*[F.lit(w) for w in sw])
    c = F.col(text_col)
    toks = F.split(c, " ")
    lines = F.split(c, "\n")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    mean_wl = _mean_word_len(toks, n_words)
    # symbols: '#' occurrences + non-overlapping '...' occurrences
    n_sym = F.regexp_count(c, F.lit("#")) + F.regexp_count(
        c, F.lit(r"\.\.\.")
    )
    symbol_ratio = n_sym / F.greatest(n_words, F.lit(1))
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
    )
    bullet_ratio = n_bullet / F.greatest(n_lines, F.lit(1))
    ellipsis_ratio = n_ellipsis / F.greatest(n_lines, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha / F.greatest(n_words, F.lit(1))
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(sw_lit, F.lower(w)))
    )

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_wordlen = (mean_wl >= min_mean_word_len) & (
        mean_wl <= max_mean_word_len
    )
    r_symbol = symbol_ratio < max_symbol_ratio
    r_bullet = bullet_ratio < max_bullet_ratio
    r_ellipsis = ellipsis_ratio < max_ellipsis_ratio
    r_alpha = alpha_ratio >= min_alpha_word_ratio
    r_stop = n_stop >= min_stopwords

    return df.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        r_words.alias("rule_word_count"),
        r_wordlen.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_bullet.alias("rule_bullet_lines"),
        r_ellipsis.alias("rule_ellipsis_lines"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (
            r_words
            & r_wordlen
            & r_symbol
            & r_bullet
            & r_ellipsis
            & r_alpha
            & r_stop
        ).alias("passes_gopher"),
    )
