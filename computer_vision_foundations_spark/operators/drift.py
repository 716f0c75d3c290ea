"""Volume-drift detection over event streams — pipeline monitoring.

A production ingest pipeline watches per-category event volumes and
alerts on days that deviate from recent history; the standard cheap
detector is a trailing z-score:

    z(day) = (count(day) − mean(trailing W days)) / stddev(trailing W days)

computed per category with the trailing window EXCLUDING the current
day (otherwise the anomaly pollutes its own baseline). Pure window
relational: one hash aggregate to daily counts (map-side combine),
one window shuffle on the category key. Day counts per category are
tiny regardless of corpus scale — the aggregate is the reduction.

``z`` is NULL until the window holds ≥2 prior days (stddev undefined)
or when the trailing stddev is 0 (constant history — any change is
"infinitely" surprising; flagged via the separate ``constant_jump``
column rather than an infinite score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["volume_drift"]


def volume_drift(
    df: DataFrame,
    ts_col: str = "ts",
    category_col: str = "event_type",
    window_days: int = 7,
    threshold: float = 3.0,
    round_digits: int = 6,
) -> DataFrame:
    """``(category, day, n_events, trail_mean, z, is_anomaly,
    constant_jump)`` per (category, day).

    ``is_anomaly`` = |z| > threshold (NULL z → false);
    ``constant_jump`` = trailing stddev is 0 over a full window but
    the day's count differs from the constant."""
    daily = df.groupBy(
        F.col(category_col).alias("category"),
        F.to_date(ts_col).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # CALENDAR-range frame, not a rows frame: ordering by the epoch day
    # number means a 3-day ingestion gap does not stretch the baseline
    # to older history — the trailing window is literally "the last W
    # calendar days". (Days with NO row still produce no z-score; to
    # flag complete outages, densify the daily counts first — e.g.
    # `operators/rollup.gap_fill_locf` with fill 0 — and feed the
    # result back through this window.)
    daily = daily.withColumn(
        "_day_num", F.datediff("day", F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("category")
        .orderBy("_day_num")
        .rangeBetween(-window_days, -1)
    )
    mean = F.avg("n_events").over(w)
    std = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    prior = F.count(F.lit(1)).over(w)
    z = F.when(
        (prior >= 2) & (std > 0),
        (F.col("n_events") - mean) / std,
    )
    out = daily.select(
        "category",
        "day",  # _day_num dropped by this projection
        "n_events",
        F.round(mean, round_digits).alias("trail_mean"),
        F.round(z, round_digits).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(threshold)), F.lit(False)
        ).alias("is_anomaly"),
        (
            (prior >= 2)
            & (std == 0)
            & (F.col("n_events") != mean)
        ).alias("constant_jump"),
    )
    return out
