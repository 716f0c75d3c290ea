"""Holt's linear-trend exponential smoothing per key.

EWMA (z68) tracks a level; Holt (1957) tracks level AND slope, the
standard next step for short-horizon operational forecasting:

    l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
    b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}          t ≥ 2
    l_1 = y_1,  b_1 = y_2 − y_1                      (textbook init)

one-step forecast ŷ = l_T + b_T. The coupled recurrence is genuinely
sequential — unlike the single-series EWMA there is no windowable
closed form that stays finite (the matrix-power expansion needs
λ^{−t} terms that overflow), so this is the documented Arrow case:
``applyInPandas`` per key, a tight float64 loop over each key's
(small) series, keys distributed across executors. Series are
pre-aggregated per (key, bucket) so the UDF sees one row per bucket,
not raw events.

The oracle replays the recurrence with a RECURSIVE CTE walking
``t = 2..T`` per key — sequential semantics expressed exactly, no
unroll cap — over the identical pre-aggregated series. Keys with a
single bucket have no defined b_1 and are dropped by both sides.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["holt_linear", "holt_oracle_sql"]


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """``(key, n_points, level, trend, forecast)`` — final Holt state
    per key over the ``order_col``-sorted ``value_col`` series.
    ``df`` must hold ONE row per (key, order) — pre-aggregate first.
    Keys with fewer than 2 points are dropped (b_1 undefined)."""
    a, b_ = float(alpha), float(beta)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].astype("float64").to_list()
        if len(y) < 2:
            return pd.DataFrame(
                columns=["key", "n_points", "level", "trend", "forecast"]
            )
        lvl, tr = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            new_lvl = a * y[t] + (1.0 - a) * (lvl + tr)
            tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
            lvl = new_lvl
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n_points": [len(y)],
                "level": [lvl],
                "trend": [tr],
                "forecast": [lvl + tr],
            }
        )

    # derive the key field's type from the input schema so non-string
    # keys (e.g. bigint user ids) round-trip through Arrow unchanged
    key_type = df.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("key", key_type),
            T.StructField("n_points", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )
    return df.groupBy(key_col).applyInPandas(fit, out_schema)


def holt_oracle_sql(
    series_sql: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_digits: int = 6,
) -> str:
    """DuckDB twin: RECURSIVE CTE walking the recurrence t=2..T per
    key. ``series_sql`` must yield ``(key, ord, y)`` with one row per
    (key, ord)."""
    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    b = f"CAST({float(beta)!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    r = round_digits
    return f"""
    WITH RECURSIVE series AS (
      SELECT key, row_number() OVER (PARTITION BY key ORDER BY ord) AS t,
             CAST(y AS DOUBLE) AS y,
             count(*) OVER (PARTITION BY key) AS n
      FROM ({series_sql}) src),
    holt(key, t, l, b, n) AS (
      SELECT s1.key, 2,
             {a} * s2.y + ({one} - {a}) * (s1.y + (s2.y - s1.y)),
             {b} * (({a} * s2.y + ({one} - {a}) * (s1.y + (s2.y - s1.y))) - s1.y)
               + ({one} - {b}) * (s2.y - s1.y),
             s1.n
      FROM series s1 JOIN series s2 ON s2.key = s1.key AND s2.t = 2
      WHERE s1.t = 1
      UNION ALL
      SELECT h.key, h.t + 1,
             {a} * s.y + ({one} - {a}) * (h.l + h.b),
             {b} * (({a} * s.y + ({one} - {a}) * (h.l + h.b)) - h.l)
               + ({one} - {b}) * h.b,
             h.n
      FROM holt h JOIN series s ON s.key = h.key AND s.t = h.t + 1)
    SELECT key, CAST(n AS BIGINT) AS n_points,
           round(l, {r}) AS level, round(b, {r}) AS trend,
           round(l + b, {r}) AS forecast
    FROM holt WHERE t = n
    """
