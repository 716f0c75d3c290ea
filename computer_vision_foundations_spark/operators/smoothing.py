"""Exponentially-weighted moving averages over keyed, ordered streams.

EWMA is the standard low-pass filter for per-entity telemetry (metric
smoothing, per-user engagement levels, rate estimators):

    s_1 = x_1;   s_t = α·x_t + (1 − α)·s_{t−1}

The recursion is sequential, which tempts per-key loops — but it has a
closed form: ``s_T = Σ_t w_t·x_t`` with ``w_t = α·(1−α)^{T−t}`` for
``t > 1`` and ``w_1 = (1−α)^{T−1}``. That makes the whole operator ONE
window pass (row_number + per-key count) and ONE keyed aggregate — a
declarative plan Catalyst can run at any scale, no recursion, no UDF,
no driver state.

Scale shape: a single shuffle on the key (the window sort and the
final aggregate share it — AQE coalesces the exchange); weights are
computed per row in codegen. Numerics: ``(1−α)^{T−t}`` underflows to
0 for old rows (double: ~700 rows back at α=0.3) — exactly the rows
whose contribution is below representable precision, so the closed
form is as accurate as the recursion for the reported 6-digit
rounding. Ordering ties break by a caller-named tiebreaker column so
the weight assignment is total and both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ewma_by_key", "ewma_oracle_sql"]


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """``(key, n, last_x, ewma)`` per key: the smoothed level after the
    key's last observation, plus that raw observation for contrast.
    ``ewma`` rounded to 6."""
    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(key_col))
        .alias("n_rows"),
    )
    weight = F.when(
        F.col("rn") == 1,
        F.pow(F.lit(1.0 - alpha), F.col("n_rows") - 1),
    ).otherwise(
        F.lit(alpha)
        * F.pow(F.lit(1.0 - alpha), F.col("n_rows") - F.col("rn"))
    )
    return (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.when(F.col("rn") == F.col("n_rows"), F.col("x"))
            ).alias("last_x"),
            F.round(F.sum(weight * F.col("x")), 6).alias("ewma"),
        )
        .orderBy("key")
    )


def ewma_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.3,
) -> str:
    """DuckDB twin — identical closed-form weights."""
    return f"""
    WITH ranked AS (
        SELECT {key_col} AS key, CAST({value_col} AS DOUBLE) AS x,
               row_number() OVER (
                   PARTITION BY {key_col}
                   ORDER BY {order_col}, {tiebreak_col}) AS rn,
               count(*) OVER (PARTITION BY {key_col}) AS n_rows
        FROM {table}
    )
    SELECT key, count(*) AS n,
           max(CASE WHEN rn = n_rows THEN x END) AS last_x,
           round(sum(
               CASE WHEN rn = 1
                    THEN pow(1.0 - {alpha}, n_rows - 1)
                    ELSE {alpha} * pow(1.0 - {alpha}, n_rows - rn)
               END * x), 6) AS ewma
    FROM ranked GROUP BY key ORDER BY key
    """
