"""Kaplan-Meier survival estimation over entity activity spans.

Retention questions ("how long does a user stay active?") are
censored-data problems: entities still active at the end of the
observation window have UNKNOWN lifetimes, and averaging observed
spans biases low. The Kaplan-Meier product-limit estimator (1958) is
the standard fix — at every distinct event time t_i with d_i deaths
among n_i entities still at risk:

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

censored entities leave the risk set without contributing a death.
This is the retention-curve machinery behind cohort dashboards
(`operators/funnel.retention_cohorts` reports the grid; this reports
the censoring-correct curve).

Defaults derive spans from the event stream itself: an entity's
lifetime is the hours between its first and last event, and it is
censored iff its last event falls within ``censor_hours`` of the
corpus's maximum timestamp (it may still be alive). Any (duration,
observed) table works.

Spark-first shape: one keyed aggregate builds per-entity spans; the
life table is |distinct durations| rows — window suffix-sums give the
risk sets, and the product is the classic exp-of-prefix-sum-of-logs
rewrite, with an exact zero carried once a factor hits 0 (ANSI Spark
returns NULL for log(0); the flag keeps both engines exact). One
shuffle on the entity key, one on the duration key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["activity_spans", "kaplan_meier", "km_oracle_sql"]


def activity_spans(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    censor_hours: int = 24,
) -> DataFrame:
    """``(id, duration_h, observed)`` — whole hours between first and
    last event; ``observed`` = 0 (censored) when the last event is
    within ``censor_hours`` of the global max timestamp."""
    spans = events.groupBy(F.col(id_col).alias("id")).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    horizon = events.agg(F.max(ts_col).alias("horizon"))
    return spans.crossJoin(F.broadcast(horizon)).select(
        "id",
        F.floor(
            (
                F.unix_timestamp("last_ts")
                - F.unix_timestamp("first_ts")
            )
            / F.lit(3600)
        )
        .cast("long")
        .alias("duration_h"),
        F.when(
            F.unix_timestamp("last_ts")
            < F.unix_timestamp("horizon") - F.lit(censor_hours * 3600),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("observed"),
    )


def kaplan_meier(spans: DataFrame) -> DataFrame:
    """``(duration_h, n_risk, n_events, survival)`` — the product-
    limit curve at every duration where a death occurs, rounded 6."""
    table = spans.groupBy("duration_h").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("observed").alias("d"),
    )
    w_ord = Window.orderBy("duration_h")
    w_from = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_upto = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = table.select(
        "duration_h",
        "d",
        F.sum("n_at").over(w_from).alias("n_risk"),
    )
    frac = F.col("d") / F.col("n_risk").cast("double")
    factors = risk.select(
        "duration_h",
        "d",
        "n_risk",
        F.when(frac < 1.0, F.log(F.lit(1.0) - frac))
        .otherwise(F.lit(0.0))
        .alias("lg"),
        F.when(frac >= 1.0, F.lit(1)).otherwise(F.lit(0)).alias("z"),
    )
    curve = factors.select(
        "duration_h",
        "n_risk",
        F.col("d").alias("n_events"),
        F.when(
            F.sum("z").over(w_upto) > 0, F.lit(0.0)
        )
        .otherwise(F.exp(F.sum("lg").over(w_upto)))
        .alias("s"),
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select(
            "duration_h",
            "n_risk",
            "n_events",
            F.round("s", 6).alias("survival"),
        )
        .orderBy("duration_h")
    )


def km_oracle_sql(
    table: str = "events",
    id_col: str = "user_id",
    ts_col: str = "ts",
    censor_hours: int = 24,
) -> str:
    """DuckDB twin — identical span derivation, risk sets, and the
    exp-sum-log product with the zero flag."""
    return f"""
    WITH spans AS (
        SELECT {id_col} AS id,
               CAST(floor((epoch(max({ts_col})) - epoch(min({ts_col})))
                          / 3600) AS BIGINT) AS duration_h,
               CASE WHEN epoch(max({ts_col}))
                         < (SELECT epoch(max({ts_col})) FROM {table})
                           - {censor_hours * 3600}
                    THEN 1 ELSE 0 END AS observed
        FROM {table} GROUP BY {id_col}
    ), lt AS (
        SELECT duration_h, count(*) AS n_at,
               CAST(sum(observed) AS BIGINT) AS d
        FROM spans GROUP BY 1
    ), risk AS (
        SELECT duration_h, d,
               CAST(sum(n_at) OVER (
                   ORDER BY duration_h
                   ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM lt
    ), factors AS (
        SELECT duration_h, d, n_risk,
               CASE WHEN d / CAST(n_risk AS DOUBLE) < 1.0
                    THEN ln(1.0 - d / CAST(n_risk AS DOUBLE))
                    ELSE 0.0 END AS lg,
               CASE WHEN d / CAST(n_risk AS DOUBLE) >= 1.0
                    THEN 1 ELSE 0 END AS z
        FROM risk
    ), curve AS (
        SELECT duration_h, n_risk, d AS n_events,
               CASE WHEN sum(z) OVER (
                        ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) > 0
                    THEN 0.0
                    ELSE exp(sum(lg) OVER (
                        ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)) END AS s
        FROM factors
    )
    SELECT duration_h, n_risk, n_events, round(s, 6) AS survival
    FROM curve WHERE n_events > 0 ORDER BY duration_h
    """
