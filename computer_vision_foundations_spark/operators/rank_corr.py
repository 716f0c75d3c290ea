"""Spearman rank correlation per group — the monotonic-trend signal.

Pearson correlation over RANKS: robust to outliers and to any
monotonic transformation, which is why data-quality monitors prefer it
for "is this metric drifting with time?" questions (the same role the
Mann-Kendall test plays in the statistics literature). Applied per
key, with ``x = event time`` it is a trend detector; with two score
columns it measures ranking agreement (e.g. BM25 vs surprisal).

Ties get AVERAGE ranks (the standard Spearman convention):
``avg_rank(v) = rank(v) + (|ties(v)| − 1) / 2`` — both engines
compute it from the same two window functions, so ranks are
bit-identical. The final coefficient is Pearson's sample correlation
over the rank pairs (Spark ``corr`` and DuckDB ``corr`` share the
formula; the 6-digit rounding convention absorbs summation-order
noise).

Spark-first shape: two rank windows + one correlation aggregate, all
partitioned by the SAME group key — one shuffle total. No UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_by_group", "spearman_oracle_sql"]


def _avg_rank(key_col: str, col: str):
    w_ord = Window.partitionBy(key_col).orderBy(col)
    w_tie = Window.partitionBy(key_col, col)
    return (
        F.rank().over(w_ord).cast("double")
        + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
    )


def spearman_by_group(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str = "event_type",
) -> DataFrame:
    """``(key, n, rho)`` per group — Spearman correlation of
    ``x_col`` vs ``y_col`` (NULL when variance is zero), rounded 6."""
    base = df.select(
        F.col(group_col).alias("key"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    ranked = base.select(
        "key",
        _avg_rank("key", "x").alias("rx"),
        _avg_rank("key", "y").alias("ry"),
    )
    # Pearson over ranks spelled out as covar/σσ with an explicit
    # zero-variance guard: ANSI Spark's corr raises DIVIDE_BY_ZERO on
    # a constant column, DuckDB's returns NULL — the explicit form
    # makes both engines compute the identical expression.
    rho = F.when(
        (F.stddev_pop("rx") > 0) & (F.stddev_pop("ry") > 0),
        F.covar_pop("rx", "ry")
        / (F.stddev_pop("rx") * F.stddev_pop("ry")),
    )
    return (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(rho, 6).alias("rho"),
        )
        .orderBy("key")
    )


def spearman_oracle_sql(
    table: str = "events",
    x_col: str = "ts",
    y_col: str = "value",
    group_col: str = "event_type",
) -> str:
    """DuckDB twin — identical average-rank construction + corr."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS key, {x_col} AS x, {y_col} AS y
        FROM {table}
        WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ), ranked AS (
        SELECT key,
               CAST(rank() OVER (PARTITION BY key ORDER BY x) AS DOUBLE)
                 + (count(*) OVER (PARTITION BY key, x) - 1) / 2.0 AS rx,
               CAST(rank() OVER (PARTITION BY key ORDER BY y) AS DOUBLE)
                 + (count(*) OVER (PARTITION BY key, y) - 1) / 2.0 AS ry
        FROM base
    )
    SELECT key, count(*) AS n,
           round(CASE WHEN stddev_pop(rx) > 0 AND stddev_pop(ry) > 0
                      THEN covar_pop(rx, ry)
                           / (stddev_pop(rx) * stddev_pop(ry))
                 END, 6) AS rho
    FROM ranked GROUP BY key ORDER BY key
    """
