"""Keyed time-series diagnostics: autocorrelation and CUSUM changepoints.

The drift family (`operators/drift.py` flags WHERE volume moved,
`operators/smoothing.py` tracks levels) gets its two classical
sequence statistics here, both over per-key bucketed counts:

- **lag-1 autocorrelation** — Pearson correlation of the bucket-count
  series against itself shifted by one bucket. Near 0 the series is
  noise; near 1 it has momentum (bursts, daily rhythm) — the number
  that decides whether an anomaly detector needs seasonal baselines.
- **CUSUM changepoint** — ``S_k = Σ_{i≤k}(x_i − x̄)``; the bucket
  maximizing ``|S_k|`` is the most likely single change point (Page
  1954, the offline max-CUSUM form), and the normalized statistic
  ``max|S_k| / (σ̂·√n)`` is the Kolmogorov-style evidence that a
  change happened at all.

Both are pure window algebra over the bucketed series — lag, prefix
sum, one aggregate — identical in any SQL engine. Gap buckets (no
events) are genuinely absent rather than zero-filled; compose with
``operators/rollup.gap_fill_locf`` first when zeros matter.

Spark-first shape: the event stream shuffles ONCE into (key, bucket)
counts; every window after that is partitioned by the same key, so
Catalyst reuses the exchange. Series state is never driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hourly_counts",
    "lag1_autocorr",
    "cusum_changepoint",
    "theil_sen_slope",
    "seasonality_strength",
    "autocorr_oracle_sql",
    "cusum_oracle_sql",
    "theil_sen_oracle_sql",
    "seasonality_oracle_sql",
]


def hourly_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, bucket, cnt)`` — events per (key, truncated hour)."""
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lag1_autocorr(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, n_buckets, r1)`` — Pearson correlation between the
    hourly-count series and its one-bucket lag (NULL when fewer than
    3 buckets or zero variance), rounded 6."""
    counts = hourly_counts(events, ts_col, key_col)
    w = Window.partitionBy("key").orderBy("bucket")
    paired = counts.select(
        "key",
        F.col("cnt").cast("double").alias("c"),
        F.lag("cnt").over(w).cast("double").alias("prev"),
    )
    return (
        paired.groupBy("key")
        .agg(
            (F.count(F.lit(1))).alias("n_buckets"),
            F.round(F.corr("c", "prev"), 6).alias("r1"),
        )
        .orderBy("key")
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, n_buckets, changepoint, stat)`` per key — the hour
    whose prefix CUSUM ``|Σ(x−x̄)|`` is maximal (earliest bucket on
    ties, so both engines agree) and the σ̂√n-normalized statistic
    (population σ over the bucket series; NULL when σ is 0),
    rounded 6."""
    counts = hourly_counts(events, ts_col, key_col)
    wk = Window.partitionBy("key")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = counts.select(
        "key",
        "bucket",
        F.col("cnt").cast("double").alias("c"),
        F.avg("cnt").over(wk).alias("mean"),
        F.stddev_pop("cnt").over(wk).alias("sd"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    stats = enriched.select(
        "key",
        "bucket",
        "sd",
        "n",
        F.abs(
            F.sum(F.col("c") - F.col("mean")).over(w)
        ).alias("s_abs"),
    )
    pick = Window.partitionBy("key").orderBy(
        F.col("s_abs").desc(), F.col("bucket")
    )
    best = stats.withColumn(
        "rn", F.row_number().over(pick)
    ).where(F.col("rn") == 1)
    return best.select(
        "key",
        F.col("n").alias("n_buckets"),
        F.col("bucket").alias("changepoint"),
        F.round(
            F.when(
                F.col("sd") > 0,
                F.col("s_abs") / (F.col("sd") * F.sqrt(F.col("n"))),
            ),
            6,
        ).alias("stat"),
    ).orderBy("key")


def autocorr_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`lag1_autocorr`."""
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, date_trunc('hour', {ts_col}) AS bucket,
               count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ), paired AS (
        SELECT key, CAST(cnt AS DOUBLE) AS c,
               CAST(lag(cnt) OVER (
                   PARTITION BY key ORDER BY bucket) AS DOUBLE) AS prev
        FROM counts
    )
    SELECT key, count(*) AS n_buckets, round(corr(c, prev), 6) AS r1
    FROM paired GROUP BY key ORDER BY key
    """


def cusum_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`cusum_changepoint` — identical window
    algebra and the same earliest-bucket tie rule."""
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, date_trunc('hour', {ts_col}) AS bucket,
               count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ), enriched AS (
        SELECT key, bucket, CAST(cnt AS DOUBLE) AS c,
               avg(cnt) OVER (PARTITION BY key) AS mean,
               stddev_pop(cnt) OVER (PARTITION BY key) AS sd,
               count(*) OVER (PARTITION BY key) AS n
        FROM counts
    ), stats AS (
        SELECT key, bucket, sd, n,
               abs(sum(c - mean)
                   OVER (PARTITION BY key ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)) AS s_abs
        FROM enriched
    ), best AS (
        SELECT *, row_number() OVER (
                   PARTITION BY key
                   ORDER BY s_abs DESC, bucket) AS rn
        FROM stats
    )
    SELECT key, n AS n_buckets, bucket AS changepoint,
           round(CASE WHEN sd > 0
                      THEN s_abs / (sd * sqrt(n)) END,
                 6) AS stat
    FROM best WHERE rn = 1 ORDER BY key
    """


def theil_sen_slope(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, n_buckets, slope)`` — the Theil-Sen estimator over the
    hourly-count series: the exact MEDIAN of all pairwise slopes
    (count_j − count_i)/(hours_j − hours_i), the robust trend line a
    single outlier bucket cannot move (breakdown point 29 %) —
    the magnitude companion to the Spearman direction test. Slope is
    per hour, rounded 6; NULL for keys with < 2 buckets.

    Scale shape: the pair formation is WITHIN-KEY over bucket-count
    rows — |buckets|² per key, bounded by the time-range/granularity
    (a year of hours = 8 760 rows → 38 M pairs per key, an executor-
    local quadratic, not a corpus one); one exact-percentile
    aggregate finishes."""
    counts = hourly_counts(events, ts_col, key_col)
    c = counts.select(
        "key",
        (F.unix_timestamp("bucket") / F.lit(3600)).alias("h"),
        F.col("cnt").cast("double").alias("c"),
    )
    a = c.select("key", F.col("h").alias("ha"), F.col("c").alias("ca"))
    b = c.select("key", F.col("h").alias("hb"), F.col("c").alias("cb"))
    slopes = (
        a.join(b, "key")
        .where(F.col("ha") < F.col("hb"))
        .select(
            "key",
            (
                (F.col("cb") - F.col("ca"))
                / (F.col("hb") - F.col("ha"))
            ).alias("s"),
        )
    )
    n_b = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets")
    )
    med = slopes.groupBy("key").agg(
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("slope")
    )
    return (
        n_b.join(med, "key", "left")
        .select("key", "n_buckets", "slope")
        .orderBy("key")
    )


def theil_sen_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`theil_sen_slope`."""
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, date_trunc('hour', {ts_col}) AS bucket,
               count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ), c AS (
        SELECT key, epoch(bucket) / 3600 AS h,
               CAST(cnt AS DOUBLE) AS c
        FROM counts
    ), slopes AS (
        SELECT a.key, (b.c - a.c) / (b.h - a.h) AS s
        FROM c a JOIN c b ON a.key = b.key AND a.h < b.h
    ), nb AS (
        SELECT key, count(*) AS n_buckets FROM counts GROUP BY key
    )
    SELECT nb.key, nb.n_buckets,
           round(m.slope, 6) AS slope
    FROM nb LEFT JOIN (
        SELECT key, quantile_cont(s, 0.5) AS slope
        FROM slopes GROUP BY key
    ) m ON m.key = nb.key
    ORDER BY nb.key
    """


def seasonality_strength(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, n_buckets, strength)`` — hour-of-day seasonality
    strength of the hourly-count series: seasonal profile = mean
    count per hour-of-day, ``strength = max(0, 1 − var(residual) /
    var(series))`` (Hyndman's FPP decomposition-strength form with a
    mean-per-slot profile) — ≈1 for a clean daily rhythm, ≈0 for
    noise; NULL when the series variance is 0. Rounded 6.

    Scale shape: two keyed aggregates (per (key, hour-of-day)
    profile, then the per-key variance pair); everything after the
    hourly reduction is bucket-count-sized."""
    counts = hourly_counts(events, ts_col, key_col)
    hod = counts.select(
        "key",
        F.hour("bucket").alias("hod"),
        F.col("cnt").cast("double").alias("c"),
    )
    prof = hod.groupBy("key", "hod").agg(F.avg("c").alias("m"))
    joined = hod.join(prof, ["key", "hod"])
    return (
        joined.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(
                F.when(
                    F.var_pop("c") > 0,
                    F.greatest(
                        F.lit(0.0),
                        F.lit(1.0)
                        - F.var_pop(F.col("c") - F.col("m"))
                        / F.var_pop("c"),
                    ),
                ),
                6,
            ).alias("strength"),
        )
        .orderBy("key")
    )


def seasonality_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`seasonality_strength`."""
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, date_trunc('hour', {ts_col}) AS bucket,
               count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ), hod AS (
        SELECT key, extract(hour FROM bucket) AS hh,
               CAST(cnt AS DOUBLE) AS c
        FROM counts
    ), prof AS (
        SELECT key, hh, avg(c) AS m FROM hod GROUP BY 1, 2
    )
    SELECT hod.key, count(*) AS n_buckets,
           round(CASE WHEN var_pop(c) > 0
                      THEN greatest(0.0,
                           1.0 - var_pop(c - m) / var_pop(c))
                 END, 6) AS strength
    FROM hod JOIN prof ON prof.key = hod.key AND prof.hh = hod.hh
    GROUP BY hod.key ORDER BY hod.key
    """
