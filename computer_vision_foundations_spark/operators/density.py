"""Distributed kernel density estimation over keyed numeric columns.

Histograms answer "how many per bin"; a Gaussian KDE answers "what
does the distribution look like" with no bin-edge artifacts — the
curve behind every distribution plot a monitoring dashboard draws.
The estimator at a grid point g is

    f̂(g) = (1/(n·h)) · Σ_i K((g − x_i)/h),   K = standard normal pdf

which is embarrassingly distributable: each row contributes one
kernel term per grid point, so a FIXED literal grid turns the whole
estimate into |grid| unrolled aggregate sums with map-side combine —
the same pattern as the per-dimension k-means sums and the Poisson
bootstrap's replica sums. No collect, no sort, one shuffle of
(key, value).

Bandwidth: Silverman's rule needs σ per key (data-dependent), which
would make the oracle dynamic — the operator takes an explicit ``h``
(callers derive it from a prior profile pass; the fixture queries pin
it), keeping the estimate a pure literal function.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kde_at_grid", "kde_oracle_sql"]

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def kde_at_grid(
    df: DataFrame,
    value_col: str,
    key_col: str,
    grid: list[float],
    bandwidth: float,
) -> DataFrame:
    """``(key, g, density)`` — the Gaussian-KDE estimate at every
    literal grid point per key, rounded 6."""
    x = F.col(value_col).cast("double")
    base = df.select(F.col(key_col).alias("key"), x.alias("x")).where(
        x.isNotNull()
    )
    h = float(bandwidth)
    sums = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.exp(
                    (F.col("x") - F.lit(float(g)))
                    * (F.col("x") - F.lit(float(g)))
                    / F.lit(-2.0 * h * h)
                )
            ).alias(f"_k{i}")
            for i, g in enumerate(grid)
        ],
    )
    dens = F.array(
        *[
            F.struct(
                F.lit(float(g)).alias("g"),
                (
                    F.col(f"_k{i}")
                    * F.lit(_INV_SQRT_2PI)
                    / (F.col("_n") * F.lit(h))
                ).alias("d"),
            )
            for i, g in enumerate(grid)
        ]
    )
    return (
        sums.select("key", F.explode(dens).alias("_e"))
        .select(
            "key",
            F.col("_e.g").alias("g"),
            F.round(F.col("_e.d"), 6).alias("density"),
        )
        .orderBy("key", "g")
    )


def kde_oracle_sql(
    table: str,
    value_col: str,
    key_col: str,
    grid: list[float],
    bandwidth: float,
) -> str:
    """DuckDB twin — identical kernel algebra per literal grid
    point."""
    h = float(bandwidth)
    cells = " UNION ALL ".join(
        f"""SELECT key, {float(g)!r} AS g,
            round(sum(exp((x - {float(g)!r}) * (x - {float(g)!r})
                          / {-2.0 * h * h!r}))
                  * {_INV_SQRT_2PI!r} / (count(*) * {h!r}), 6)
                AS density
            FROM base GROUP BY key"""
        for g in grid
    )
    return f"""
    WITH base AS (
        SELECT {key_col} AS key, CAST({value_col} AS DOUBLE) AS x
        FROM {table} WHERE {value_col} IS NOT NULL
    )
    SELECT * FROM ({cells}) ORDER BY key, g
    """
