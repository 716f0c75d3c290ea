"""RFM (recency / frequency / monetary) customer segmentation.

The classical marketing segmentation: score every customer 1-5 on
how recently, how often, and how much they ordered, by global
quintile rank. The subtle distributed problem is the GLOBAL rank — a
bare ``row_number() OVER (ORDER BY metric)`` funnels the whole table
through one task, so each score rides
:func:`~computer_vision_foundations_spark.operators.qnorm.
global_row_number` (range-partition + per-partition numbering +
broadcast offsets) instead. Quintile assignment is the exact integer
formula ``floor((rn−1)·5 / n) + 1`` over the total order
(metric, customer) — deterministic under ties, unlike bare
``ntile`` whose remainder placement the two engines could order
differently without the unique tiebreak.

Shuffle budget: one orders→customer aggregate, then per score one
range partitioning of the (small) customer aggregate; the final
segment rollup is a hash aggregate on (r, f, m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.qnorm import (
    global_row_number,
)

__all__ = ["rfm_segments", "rfm_oracle_sql"]


def _quintile(df: DataFrame, order_cols: list[str], out: str) -> DataFrame:
    """Score 1-5 by global rank over ``order_cols`` (ascending =
    lower score). Adds column ``out``; consumes/overwrites ``_rn``."""
    ranked = global_row_number(df, order_cols, out="_rn")
    return ranked.withColumn(
        out,
        (
            F.floor(
                (F.col("_rn") - 1) * 5 / F.col("_n_total")
            )
            + 1
        ).cast("int"),
    ).drop("_rn")


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """``(r_score, f_score, m_score, n_customers, avg_recency_days,
    total_monetary)`` — quintile-scored RFM segment rollup."""
    per_cust = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(date_col).alias("last_date"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(amount_col).alias("monetary"),
    )
    anchor = orders.select(
        F.max(date_col).alias("_anchor"),
        F.count(F.lit(1)).alias("_n_orders"),
    )
    base = (
        per_cust.crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days", F.datediff(F.col("_anchor"), F.col("last_date"))
        )
        .drop("_anchor", "_n_orders", "last_date")
    )
    n_total = base.select(
        F.count(F.lit(1)).alias("_n_total")
    )
    base = base.crossJoin(F.broadcast(n_total))
    # recency: DESC days so the most recent customers land in the top
    # quintile; freq/monetary: ASC so bigger = higher score. Customer
    # id makes every order total.
    scored = _quintile(
        base.withColumn("_neg_rec", -F.col("recency_days")),
        ["_neg_rec", "cust"],
        "r_score",
    ).drop("_neg_rec")
    scored = _quintile(scored, ["freq", "cust"], "f_score")
    scored = _quintile(scored, ["monetary", "cust"], "m_score")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("recency_days"), 4).alias("avg_recency_days"),
        F.round(F.sum("monetary"), 2).alias("total_monetary"),
    )


def rfm_oracle_sql(
    table: str = "orders",
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> str:
    """DuckDB twin: same aggregate, same ``floor((rn−1)·5/n)+1`` over
    the same (metric, customer) total orders."""
    return f"""
    WITH per_cust AS (
      SELECT {cust_col} AS cust,
             max({date_col}) AS last_date,
             count(*) AS freq,
             sum({amount_col}) AS monetary
      FROM {table} GROUP BY {cust_col}),
    anchor AS (SELECT max({date_col}) AS a FROM {table}),
    base AS (
      SELECT cust, freq, monetary,
             date_diff('day', last_date, anchor.a) AS recency_days,
             (SELECT count(*) FROM per_cust) AS n_total
      FROM per_cust, anchor),
    ranked AS (
      SELECT *,
        row_number() OVER (ORDER BY -recency_days, cust) AS rn_r,
        row_number() OVER (ORDER BY freq, cust) AS rn_f,
        row_number() OVER (ORDER BY monetary, cust) AS rn_m
      FROM base),
    scored AS (
      SELECT recency_days, monetary,
        CAST(floor((rn_r - 1) * 5 / n_total) + 1 AS INTEGER) AS r_score,
        CAST(floor((rn_f - 1) * 5 / n_total) + 1 AS INTEGER) AS f_score,
        CAST(floor((rn_m - 1) * 5 / n_total) + 1 AS INTEGER) AS m_score
      FROM ranked)
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(recency_days), 4) AS avg_recency_days,
           round(CAST(sum(monetary) AS DOUBLE), 2) AS total_monetary
    FROM scored GROUP BY r_score, f_score, m_score
    """
