"""CUPED variance reduction for A/B experiments (Controlled-experiment
Using Pre-Experiment Data, Deng et al. 2013).

The highest-leverage trick in online experimentation: regress the
experiment metric Y on a pre-experiment covariate X and analyze the
adjusted metric

    Y' = Y − θ·(X − mean(X)),     θ = cov(X, Y) / var(X)

which has the same expectation (randomization makes X independent of
assignment) but variance shrunk by the squared correlation r² —
routinely 30-60 % fewer samples for the same power. Complements the
repo's plain two-sample z-test (z90) with the adjusted estimator an
experimentation platform actually ships.

Spark-first + determinism design:
- per-user pre/post aggregates on the 1e-6 fixed-point grid (BIGINT);
- the moment sums Σx, Σy, Σx², Σxy, Σy² are DECIMAL(38,0) sums of
  exact integer products — associative, partition-order-free (q09
  lesson); θ, means, lifts and the variance-reduction ratio are a
  handful of scalar ops on those exact sums, written with the same
  operation tree in the DuckDB twin;
- assignment is the portable seeded md5 hash unit — replayable in SQL.

Scale shape: one groupBy to |users| rows, one global aggregate of six
moments. Nothing downstream of the aggregate is data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.conformal import split_unit

__all__ = ["cuped_lift", "cuped_oracle_sql"]

_SCALE = 1_000_000


def cuped_lift(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    cutover: str = "2024-01-16 00:00:00",
    seed: int = 23,
    round_digits: int = 6,
) -> DataFrame:
    """One row ``(n_treat, n_ctrl, theta, lift_raw, lift_cuped,
    var_reduction)``: per-user pre/post sums, hash-unit treatment
    assignment, pooled θ from exact moments, raw vs CUPED-adjusted
    treatment-control difference in post-period means, and the r²
    variance-reduction ratio."""
    cut = F.lit(cutover).cast("timestamp")
    per_user = (
        df.select(
            F.col(user_col).alias("u"),
            F.when(
                F.col(ts_col) < cut,
                F.floor(
                    F.col(value_col).cast("double") * _SCALE + F.lit(0.5)
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("qx"),
            F.when(
                F.col(ts_col) >= cut,
                F.floor(
                    F.col(value_col).cast("double") * _SCALE + F.lit(0.5)
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("qy"),
        )
        .groupBy("u")
        .agg(F.sum("qx").alias("qx"), F.sum("qy").alias("qy"))
        .select(
            "u",
            "qx",
            "qy",
            (split_unit(seed, F.col("u")) < F.lit(0.5)).alias("treat"),
        )
    )
    dx = F.col("qx").cast("decimal(38,0)")
    dy = F.col("qy").cast("decimal(38,0)")
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dy * dy).alias("syy"),
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("treat"), dx).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("sxt"),
        F.sum(F.when(F.col("treat"), dy).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("syt"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    nt = F.col("nt").cast("double")
    nc = (F.col("n") - F.col("nt")).cast("double")
    sxc = (F.col("sx") - F.col("sxt")).cast("double")
    syc = (F.col("sy") - F.col("syt")).cast("double")
    sxt = F.col("sxt").cast("double")
    syt = F.col("syt").cast("double")
    g = F.lit(float(_SCALE))
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    # Degenerate-input contract: a constant pre-period covariate
    # (varx_n == 0, e.g. no events before cutover) or an empty arm
    # (nt == 0 or nc == 0) yields NULL theta/lift/var_reduction rather
    # than an ANSI DIVIDE_BY_ZERO error — nullif() on every
    # denominator, mirrored verbatim in the oracle. All quantities are
    # exact integers cast to double, so the == 0 test is exact.
    theta = cov_n / F.nullif(varx_n, F.lit(0.0))
    lift_raw = (syt / F.nullif(nt, F.lit(0.0)) - syc / F.nullif(nc, F.lit(0.0))) / g
    lift_cuped = lift_raw - theta * (
        (sxt / F.nullif(nt, F.lit(0.0)) - sxc / F.nullif(nc, F.lit(0.0))) / g
    )
    var_red = (cov_n * cov_n) / F.nullif(varx_n * vary_n, F.lit(0.0))
    return mom.select(
        F.col("nt").alias("n_treat"),
        (F.col("n") - F.col("nt")).alias("n_ctrl"),
        F.round(theta, round_digits).alias("theta"),
        F.round(lift_raw, round_digits).alias("lift_raw"),
        F.round(lift_cuped, round_digits).alias("lift_cuped"),
        F.round(var_red, round_digits).alias("var_reduction"),
    )


def cuped_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    cutover: str = "2024-01-16 00:00:00",
    seed: int = 23,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical grid, HUGEINT-exact moments, identical
    scalar expression tree."""
    u = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' || "
        f"CAST(u AS VARCHAR)), 1, 7)) AS BIGINT) / {float(1 << 28)!r}"
    )
    return f"""
    WITH per_user AS (
        SELECT {user_col} AS u,
               sum(CASE WHEN {ts_col} < TIMESTAMP '{cutover}'
                   THEN CAST(floor(CAST({value_col} AS DOUBLE) * {_SCALE}.0
                                   + 0.5) AS BIGINT) ELSE 0 END) AS qx,
               sum(CASE WHEN {ts_col} >= TIMESTAMP '{cutover}'
                   THEN CAST(floor(CAST({value_col} AS DOUBLE) * {_SCALE}.0
                                   + 0.5) AS BIGINT) ELSE 0 END) AS qy
        FROM {table} GROUP BY 1
    ), assigned AS (
        SELECT u, qx, qy, ({u}) < 0.5 AS treat FROM per_user
    ), mom AS (
        SELECT count(*) AS n,
               sum(CAST(qx AS HUGEINT)) AS sx,
               sum(CAST(qy AS HUGEINT)) AS sy,
               sum(CAST(qx AS HUGEINT) * CAST(qx AS HUGEINT)) AS sxx,
               sum(CAST(qx AS HUGEINT) * CAST(qy AS HUGEINT)) AS sxy,
               sum(CAST(qy AS HUGEINT) * CAST(qy AS HUGEINT)) AS syy,
               sum(CASE WHEN treat THEN 1 ELSE 0 END) AS nt,
               sum(CASE WHEN treat THEN CAST(qx AS HUGEINT)
                        ELSE 0 END) AS sxt,
               sum(CASE WHEN treat THEN CAST(qy AS HUGEINT)
                        ELSE 0 END) AS syt
        FROM assigned
    )
    SELECT CAST(nt AS BIGINT) AS n_treat,
           CAST(n - nt AS BIGINT) AS n_ctrl,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0),
                 {round_digits}) AS theta,
           round((CAST(syt AS DOUBLE) / NULLIF(CAST(nt AS DOUBLE), 0.0)
                  - CAST(sy - syt AS DOUBLE)
                    / NULLIF(CAST(n - nt AS DOUBLE), 0.0))
                 / {_SCALE}.0, {round_digits}) AS lift_raw,
           round((CAST(syt AS DOUBLE) / NULLIF(CAST(nt AS DOUBLE), 0.0)
                  - CAST(sy - syt AS DOUBLE)
                    / NULLIF(CAST(n - nt AS DOUBLE), 0.0))
                 / {_SCALE}.0
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                   * ((CAST(sxt AS DOUBLE) / NULLIF(CAST(nt AS DOUBLE), 0.0)
                       - CAST(sx - sxt AS DOUBLE)
                         / NULLIF(CAST(n - nt AS DOUBLE), 0.0))
                      / {_SCALE}.0),
                 {round_digits}) AS lift_cuped,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0),
                 {round_digits}) AS var_reduction
    FROM mom
    """
