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
    "autocorr_oracle_sql",
    "cusum_oracle_sql",
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
