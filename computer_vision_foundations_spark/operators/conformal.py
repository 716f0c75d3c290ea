"""Split-conformal prediction intervals — distribution-free ML eval.

Split conformal (Vovk et al.; Lei et al. 2018) wraps ANY point
predictor with a finite-sample coverage guarantee: on a held-out
calibration split, take the k-th smallest absolute residual with
k = ⌈(n_cal+1)·(1−α)⌉; the interval pred ± q̂ then covers fresh points
with probability ≥ 1−α. For a training-data platform this is the
standard way to turn a quality/score model into a calibrated keep
band.

Spark-first + differential-oracle design:

- the calibration/evaluation split is the engine's portable seeded
  hash unit (md5 28-bit slice) — replayable in SQL, invariant to
  partitioning (unlike Spark's Bernoulli sampler);
- the baseline predictor and the residuals are computed on the exact
  1e-6 fixed-point grid (integer sums → one float divide), so nothing
  anywhere in the pipeline depends on float reduction order — the
  za50 lesson applied from the start;
- q̂ is an EXACT order statistic: rank via the scale-safe two-phase
  global row number (`qnorm.global_row_number` — range partition +
  broadcast offsets, no single-task sort), filter rank = k. No
  percentile interpolation, so both engines agree bit-for-bit;
- coverage on the evaluation split is an integer count ratio.

Everything is one scan per split + model-sized joins; the only
collect inside `global_row_number` is |partitions| offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.qnorm import (
    global_row_number,
)

__all__ = [
    "split_unit",
    "conformal_band",
    "conformal_oracle_sql",
]

_SCALE = 1_000_000


def split_unit(seed: int, id_col: Column) -> Column:
    """Seeded uniform in [0, 1) from the md5 28-bit slice of
    ``seed|id`` — the repo's portable hash-unit convention (partition
    invariant, SQL replayable)."""
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") / F.lit(
        float(1 << 28)
    )


def _fixed(col: Column) -> Column:
    """floor(x·1e6 + 0.5) as BIGINT — the exact-grid quantizer."""
    return F.floor(col.cast("double") * F.lit(float(_SCALE)) + F.lit(0.5)).cast(
        "long"
    )


def conformal_band(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    alpha: float = 0.1,
    cal_frac: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """One row ``(n_cal, n_eval, q_hat, coverage)``: fit a per-group
    mean baseline on the calibration split, conformalize its absolute
    residuals, and report the band half-width q̂ plus the achieved
    coverage of ``mean ± q̂`` on the evaluation split (finite-sample
    guarantee: ≥ 1−α in expectation). Groups unseen in calibration are
    dropped from evaluation (no prediction to conformalize)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("g"),
        _fixed(F.col(value_col)).alias("qv"),
    ).where(F.col(value_col).isNotNull())
    u = split_unit(seed, F.col("id"))
    cal = base.where(u < F.lit(float(cal_frac)))
    ev = base.where(u >= F.lit(float(cal_frac)))

    # per-group baseline: exact integer sum / count, ONE float divide
    model = cal.groupBy("g").agg(
        (
            F.sum("qv").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(_SCALE))
        ).alias("pred")
    )

    # calibration residuals on the grid; exact global order statistic
    res = cal.join(F.broadcast(model), "g").select(
        "id",
        F.abs(
            F.col("qv").cast("double") / F.lit(float(_SCALE)) - F.col("pred")
        ).alias("r"),
    )
    ranked = global_row_number(res, ["r", "id"], out="rn")
    n_cal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    k = F.least(
        F.ceil((F.col("n_cal") + 1) * F.lit(float(1.0 - alpha))),
        F.col("n_cal"),
    )
    q_hat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .where(F.col("rn") == k)
        .select("r", "n_cal")
    )

    covered = (
        ev.join(F.broadcast(model), "g")
        .crossJoin(F.broadcast(q_hat))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.max("r"), 6).alias("q_hat"),
            F.round(
                F.sum(
                    F.when(
                        F.abs(
                            F.col("qv").cast("double") / F.lit(float(_SCALE))
                            - F.col("pred")
                        )
                        <= F.col("r"),
                        1,
                    ).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("coverage"),
        )
    )
    return covered.select("n_cal", "n_eval", "q_hat", "coverage")


def conformal_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    alpha: float = 0.1,
    cal_frac: float = 0.5,
    seed: int = 7,
) -> str:
    """DuckDB twin — identical hash split, fixed-point baseline, exact
    order statistic, and coverage count."""
    u = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({id_col} AS VARCHAR)), 1, 7)) AS BIGINT) / {float(1 << 28)!r}"
    )
    return f"""
    WITH base AS (
        SELECT {id_col} AS id, {group_col} AS g,
               CAST(floor(CAST({value_col} AS DOUBLE) * 1000000.0 + 0.5)
                    AS BIGINT) AS qv,
               ({u}) AS u
        FROM {table} WHERE {value_col} IS NOT NULL
    ), cal AS (
        SELECT * FROM base WHERE u < {float(cal_frac)!r}
    ), ev AS (
        SELECT * FROM base WHERE u >= {float(cal_frac)!r}
    ), model AS (
        SELECT g, CAST(sum(qv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  / 1000000.0 AS pred
        FROM cal GROUP BY g
    ), res AS (
        SELECT cal.id,
               abs(CAST(cal.qv AS DOUBLE) / 1000000.0 - m.pred) AS r
        FROM cal JOIN model m USING (g)
    ), nc AS (
        SELECT count(*) AS n_cal FROM cal
    ), ranked AS (
        SELECT r, row_number() OVER (ORDER BY r, id) AS rn FROM res
    ), qh AS (
        SELECT r, n_cal FROM ranked CROSS JOIN nc
        WHERE rn = least(CAST(ceil((n_cal + 1) * {float(1.0 - alpha)!r})
                              AS BIGINT), n_cal)
    )
    SELECT max(qh.n_cal) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(max(qh.r), 6) AS q_hat,
           round(sum(CASE WHEN abs(CAST(ev.qv AS DOUBLE) / 1000000.0
                                   - m.pred) <= qh.r
                          THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS coverage
    FROM ev JOIN model m USING (g) CROSS JOIN qh
    """
