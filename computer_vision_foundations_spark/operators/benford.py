"""Benford first-significant-digit audit over numeric columns.

Naturally-occurring multiplicative quantities (transaction amounts,
file sizes, populations) follow Benford's law:
``P(d) = log10(1 + 1/d)`` for the first significant digit d ∈ 1..9.
Synthetic, truncated, or fabricated data does not — which makes the
digit histogram plus its chi-square distance a standard forensic /
data-quality screen (fraud audits, sensor-pipeline sanity checks,
detecting silently clipped columns).

First-digit extraction is pure arithmetic, identical in both engines:
``d = floor(|x| / 10^floor(log10(|x|)))`` over non-zero values (zero
and NULL carry no leading digit). Per digit the operator reports the
observed count, the Benford-expected count, and the chi-square
contribution ``(obs − exp)² / exp``; the sum of the last column is the
test statistic (8 degrees of freedom).

Spark-first shape: one projection + one 9-row hash aggregate joined to
a broadcast 9-row expectation table built with ``sequence``. The
column shuffles once as (digit) keys. No UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["benford_digits", "benford_oracle_sql"]


def benford_digits(
    df: DataFrame, value_col: str = "value"
) -> DataFrame:
    """``(digit, n, expected, chi2)`` for digits 1..9 (digits never
    observed still appear, n = 0); floats rounded to 6."""
    spark = df.sparkSession
    x = F.abs(F.col(value_col))
    digit = F.floor(
        x / F.pow(F.lit(10.0), F.floor(F.log10(x)))
    ).cast("int")
    obs = (
        df.where(F.col(value_col).isNotNull() & (x > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = obs.agg(F.sum("n").alias("total"))
    digits = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    grid = digits.crossJoin(F.broadcast(total)).join(
        obs, "digit", "left"
    )
    expected = F.col("total") * F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit")
    )
    n = F.coalesce(F.col("n"), F.lit(0))
    return grid.select(
        "digit",
        n.alias("n"),
        F.round(expected, 6).alias("expected"),
        F.round(
            (n - expected) * (n - expected) / expected, 6
        ).alias("chi2"),
    ).orderBy("digit")


def benford_oracle_sql(
    table: str = "events", value_col: str = "value"
) -> str:
    """DuckDB twin — same digit arithmetic and expectation algebra."""
    return f"""
    WITH vals AS (
        SELECT abs({value_col}) AS x FROM {table}
        WHERE {value_col} IS NOT NULL AND abs({value_col}) > 0
    ), obs AS (
        SELECT CAST(floor(x / pow(10.0, floor(log10(x)))) AS INT)
                   AS digit,
               count(*) AS n
        FROM vals GROUP BY 1
    ), total AS (
        SELECT CAST(sum(n) AS BIGINT) AS total FROM obs
    ), digits AS (
        SELECT unnest(range(1, 10)) AS digit
    )
    SELECT CAST(digits.digit AS INT) AS digit,
           COALESCE(obs.n, 0) AS n,
           round(total.total * log10(1.0 + 1.0 / digits.digit), 6)
               AS expected,
           round((COALESCE(obs.n, 0)
                  - total.total * log10(1.0 + 1.0 / digits.digit))
                 * (COALESCE(obs.n, 0)
                    - total.total * log10(1.0 + 1.0 / digits.digit))
                 / (total.total * log10(1.0 + 1.0 / digits.digit)), 6)
               AS chi2
    FROM digits CROSS JOIN total
    LEFT JOIN obs ON obs.digit = digits.digit
    ORDER BY 1
    """
