"""Leakage-free categorical feature encoding: out-of-fold target
encoding and weight-of-evidence / information value.

Target encoding replaces a category with the target mean of OTHER
rows — done naively it leaks the row's own label into its feature.
The standard production fix is K-fold out-of-fold encoding: hash each
row into one of K folds, encode fold f's rows with the statistics of
the other K−1 folds, smoothed toward the global prior so rare
categories don't memorize. WoE/IV is the credit-scoring sibling for
binned features: per-bin log-odds against the global odds, and the
information value Σ (good% − bad%)·WoE as the feature-screening
statistic.

Spark-first + determinism design:
- the fold assignment is the engine's portable seeded md5 hash unit
  (conformal.split_unit) — partition-invariant, SQL-replayable;
- every accumulated quantity is exact: targets quantized to the 1e-6
  fixed-point grid and summed as DECIMAL(38,0) (order-free), counts
  are integers; the encoding itself is a per-row scalar over those
  exact sums;
- IV's cross-bin sum is over per-bin contributions quantized to the
  1e-6 grid as BIGINT — no float reduction order anywhere (q09
  lesson).

Scale shape: one map-side-combinable groupBy to |categories|·K (resp.
|bins|) rows; everything after is model-sized. No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.conformal import split_unit

__all__ = [
    "oof_target_encoding",
    "target_encoding_oracle_sql",
    "woe_iv",
    "woe_iv_oracle_sql",
]

_SCALE = 1_000_000


def oof_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 10.0,
    seed: int = 11,
    round_digits: int = 6,
) -> DataFrame:
    """Per (category, fold) out-of-fold smoothed target mean:
    ``(category, fold, n_oof, encoding)`` with
    ``encoding = (oof_sum + m·prior) / (oof_n + m)`` where the prior
    is the global target mean. Rows of fold f never contribute to
    fold f's encoding."""
    base = df.select(
        F.col(cat_col).alias("category"),
        F.floor(split_unit(seed, F.col(id_col)) * k)
        .cast("int")
        .alias("fold"),
        F.floor(F.col(target_col).cast("double") * _SCALE + F.lit(0.5))
        .cast("long")
        .alias("qt"),
    )
    per = base.groupBy("category", "fold").agg(
        F.sum(F.col("qt").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    w_cat = Window.partitionBy("category")
    tot = per.select(
        "category",
        "fold",
        "s",
        "c",
        F.sum("s").over(w_cat).alias("st"),
        F.sum("c").over(w_cat).alias("ct"),
    )
    glob = per.agg(
        (
            F.sum("s").cast("double")
            / F.sum("c").cast("double")
            / F.lit(float(_SCALE))
        ).alias("prior")
    )
    m = F.lit(float(smoothing))
    enc = (
        (F.col("st") - F.col("s")).cast("double") / F.lit(float(_SCALE))
        + m * F.col("prior")
    ) / ((F.col("ct") - F.col("c")).cast("double") + m)
    return tot.crossJoin(F.broadcast(glob)).select(
        "category",
        "fold",
        (F.col("ct") - F.col("c")).alias("n_oof"),
        F.round(enc, round_digits).alias("encoding"),
    )


def target_encoding_oracle_sql(
    table: str,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 10.0,
    seed: int = 11,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical hash folds, DECIMAL-exact sums,
    identical scalar expression tree."""
    u = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({id_col} AS VARCHAR)), 1, 7)) AS BIGINT) / {float(1 << 28)!r}"
    )
    return f"""
    WITH base AS (
        SELECT {cat_col} AS category,
               CAST(floor(({u}) * {k}) AS INT) AS fold,
               CAST(floor(CAST({target_col} AS DOUBLE) * {_SCALE}.0 + 0.5)
                    AS BIGINT) AS qt
        FROM {table}
    ), per AS (
        SELECT category, fold, sum(qt) AS s, count(*) AS c
        FROM base GROUP BY 1, 2
    ), tot AS (
        SELECT category, fold, s, c,
               sum(s) OVER (PARTITION BY category) AS st,
               sum(c) OVER (PARTITION BY category) AS ct
        FROM per
    ), gpri AS (
        SELECT CAST(sum(s) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
               / {_SCALE}.0 AS prior
        FROM per
    )
    SELECT category, fold, CAST(ct - c AS BIGINT) AS n_oof,
           round((CAST(st - s AS DOUBLE) / {_SCALE}.0
                  + {float(smoothing)!r} * prior)
                 / (CAST(ct - c AS DOUBLE) + {float(smoothing)!r}),
                 {round_digits}) AS encoding
    FROM tot CROSS JOIN gpri
    """


def woe_iv(
    df: DataFrame,
    bin_col: Column,
    label: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bin weight of evidence and the feature's information value:
    ``(bin, n_good, n_bad, woe, iv)`` with 0.5 add-one smoothing in
    the numerators and ``iv`` (the same total on every row) summed on
    the 1e-6 grid so the cross-bin reduction is exact."""
    hist = (
        df.select(
            bin_col.cast("int").alias("bin"),
            label.cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.lit(1) - F.col("y")).alias("n_good"),
            F.sum("y").alias("n_bad"),
        )
    )
    w_all = Window.partitionBy()
    tot = hist.select(
        "bin",
        "n_good",
        "n_bad",
        F.sum("n_good").over(w_all).alias("gt"),
        F.sum("n_bad").over(w_all).alias("bt"),
    )
    gr = (F.col("n_good").cast("double") + F.lit(0.5)) / F.col("gt").cast(
        "double"
    )
    br = (F.col("n_bad").cast("double") + F.lit(0.5)) / F.col("bt").cast(
        "double"
    )
    woe = F.log(gr / br)
    contrib_q = F.floor((gr - br) * woe * _SCALE + F.lit(0.5)).cast("long")
    scored = tot.select(
        "bin",
        "n_good",
        "n_bad",
        F.round(woe, round_digits).alias("woe"),
        contrib_q.alias("_cq"),
    )
    return scored.select(
        "bin",
        "n_good",
        "n_bad",
        "woe",
        F.round(
            F.sum("_cq").over(w_all).cast("double") / F.lit(float(_SCALE)),
            round_digits,
        ).alias("iv"),
    )


def woe_iv_oracle_sql(
    source_sql: str, round_digits: int = 6
) -> str:
    """DuckDB twin over ``source_sql`` yielding ``(bin, y)`` — same
    smoothing, same expression tree, same quantized IV reduction."""
    return f"""
    WITH src AS ({source_sql}),
    hist AS (
        SELECT bin, CAST(sum(1 - y) AS BIGINT) AS n_good,
               CAST(sum(y) AS BIGINT) AS n_bad
        FROM src GROUP BY 1
    ), tot AS (
        SELECT bin, n_good, n_bad,
               CAST(sum(n_good) OVER () AS BIGINT) AS gt,
               CAST(sum(n_bad) OVER () AS BIGINT) AS bt
        FROM hist
    ), scored AS (
        SELECT bin, n_good, n_bad,
               round(ln(((CAST(n_good AS DOUBLE) + 0.5) / CAST(gt AS DOUBLE))
                        / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(bt AS DOUBLE))),
                     {round_digits}) AS woe,
               CAST(floor(((CAST(n_good AS DOUBLE) + 0.5) / CAST(gt AS DOUBLE)
                           - (CAST(n_bad AS DOUBLE) + 0.5) / CAST(bt AS DOUBLE))
                          * ln(((CAST(n_good AS DOUBLE) + 0.5) / CAST(gt AS DOUBLE))
                               / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(bt AS DOUBLE)))
                          * {_SCALE} + 0.5) AS BIGINT) AS cq
        FROM tot
    )
    SELECT bin, n_good, n_bad, woe,
           round(CAST(sum(cq) OVER () AS DOUBLE) / {_SCALE}.0,
                 {round_digits}) AS iv
    FROM scored
    """
