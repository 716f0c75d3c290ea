"""Zipf-law fit of a token frequency distribution.

Corpus-health diagnostic standard in the LLM-data literature: natural
text follows freq ∝ rank^(-s) with s ≈ 1; heavily templated or
machine-generated corpora bend the curve (|s| drifts, fit degrades).
The fit is OLS on (log rank, log freq) over the top-``n_ranks``
vocabulary — alongside Heaps' law (z62) it is the second classic
vocabulary-growth check.

Determinism contract: ranks come from row_number ordered by
(cnt DESC, token ASC) — the id tiebreak makes rank a pure function of
the count table on both engines. The OLS moments are plain double
sums over ``n_ranks`` rows (a FIXED, small count — 256 here), summed
in the single-partition window stage, so reduction order is fixed;
slope/intercept are one fixed expression tree, rounded 6.

Spark-first shape: one map-side-combinable token count (the z62/q04
budget), one top-N (rank window over |vocab| rows), then a 1-row
aggregate over N rows. Document bodies never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "zipf_fit",
    "zipf_oracle_sql",
    "hill_tail_index",
    "hill_oracle_sql",
]


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    n_ranks: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """``(n_ranks, slope, intercept, r2)`` of log-freq vs log-rank
    over the ``n_ranks`` most frequent tokens (whitespace tokens,
    lowercased)."""
    toks = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = (
        toks.select("cnt", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= n_ranks)
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    # NULLIF-guard the variance denominators (the cuped.py pattern):
    # a degenerate corpus with <2 distinct tokens gives varx_n = 0 and
    # would raise DIVIDE_BY_ZERO under ANSI Spark; NULL propagates to
    # (slope, intercept, r2) identically on both engines instead.
    slope = cov_n / F.nullif(varx_n, F.lit(0.0))
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov_n * cov_n) / F.nullif(varx_n * vary_n, F.lit(0.0))
    return mom.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def zipf_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    n_ranks: int = 256,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical tokenization, (cnt DESC, tok ASC)
    ranking, and OLS expression tree."""
    return f"""
    WITH toks AS (
        SELECT t.tok AS tok
        FROM {table},
             unnest(string_split_regex(lower({text_col}), '\\s+')) t(tok)
        WHERE t.tok <> ''
    ), counts AS (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC)
                       AS DOUBLE)) AS x,
               ln(CAST(cnt AS DOUBLE)) AS y
        FROM counts
        QUALIFY row_number() OVER (ORDER BY cnt DESC, tok ASC) <= {n_ranks}
    ), mom AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM ranked
    )
    SELECT n AS n_ranks,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / NULLIF(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0),
                 {round_digits}) AS slope,
           round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / NULLIF(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0))
                       * sx)
                 / CAST(n AS DOUBLE), {round_digits}) AS intercept,
           round(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / NULLIF((CAST(n AS DOUBLE) * sxx - sx * sx)
                          * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0),
                 {round_digits}) AS r2
    FROM mom
    """


def hill_tail_index(
    df: DataFrame,
    text_col: str = "text",
    k: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """Hill estimator of the token-frequency tail index (Hill 1975):
    over the k largest counts X(1) >= ... >= X(k) with threshold
    X(k+1), H = mean(ln X(i) - ln X(k+1)) and alpha = 1/H — the
    standard heavy-tail exponent check next to the Zipf OLS fit
    (``zipf_fit``): OLS fits the whole top-of-vocabulary curve, Hill
    measures only the extreme tail, so corpora that are Zipf-like in
    the bulk but truncated/inflated at the head (boilerplate spam,
    templated text) separate the two diagnostics.

    Determinism: ranks from row_number ordered by (cnt DESC, token
    ASC); H is a mean over a FIXED k rows, reduced in one single-row
    aggregate; NULLIF guards the degenerate all-equal-counts corpus
    (H = 0) on both engines.

    Scale shape: identical to ``zipf_fit`` — one map-side-combinable
    token count, one top-(k+1) rank window over |vocab| rows, one
    k-row aggregate. Document bodies never shuffle."""
    toks = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = toks.select(
        "cnt", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k + 1)
    thresh = ranked.where(F.col("rank") == k + 1).select(
        F.col("cnt").alias("x_k1")
    )
    top = ranked.where(F.col("rank") <= k)
    agg = top.join(F.broadcast(thresh)).agg(
        F.count(F.lit(1)).alias("k_used"),
        F.avg(
            F.log(F.col("cnt").cast("double"))
            - F.log(F.col("x_k1").cast("double"))
        ).alias("h"),
    )
    return agg.select(
        "k_used",
        F.round("h", round_digits).alias("hill_h"),
        F.round(
            F.lit(1.0) / F.nullif(F.col("h"), F.lit(0.0)), round_digits
        ).alias("tail_index"),
    )


def hill_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = 256,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical tokenization, ranking and mean."""
    return f"""
    WITH toks AS (
        SELECT t.tok AS tok
        FROM {table},
             unnest(string_split_regex(lower({text_col}), '\\s+')) t(tok)
        WHERE t.tok <> ''
    ), counts AS (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
        FROM counts
        QUALIFY row_number() OVER (ORDER BY cnt DESC, tok ASC) <= {k + 1}
    ), thresh AS (
        SELECT cnt AS x_k1 FROM ranked WHERE rank = {k + 1}
    ), agg AS (
        SELECT count(*) AS k_used,
               avg(ln(CAST(cnt AS DOUBLE)) - ln(CAST(x_k1 AS DOUBLE))) AS h
        FROM ranked CROSS JOIN thresh WHERE rank <= {k}
    )
    SELECT k_used,
           round(h, {round_digits}) AS hill_h,
           round(1.0 / NULLIF(h, 0.0), {round_digits}) AS tail_index
    FROM agg
    """
