"""Event-time windowing / sessionization (engine extension, ST5).

The reference pipeline is stateless map+append; a general engine needs
watermarked event-time aggregation for late data. These helpers work on
BOTH batch and streaming DataFrames (watermark is a no-op in batch), so
the same code is differential-testable in batch against the SQL oracle
and deployable as a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window count/sum per group."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionized(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Batch sessionization: gap-based session ids per user.

    Classic lag/cumsum construction (new session when the gap from the
    previous event exceeds ``gap_seconds``). For true streaming
    sessions use ``F.session_window`` with a watermark; this batch
    variant is exact and oracle-checkable.

    ``tiebreak_cols`` makes the window ordering total: with equal
    timestamps the lag/cumsum tags depend on row order, so a
    deterministic tiebreak (a unique event id) is required for
    run-to-run reproducibility. Pass ``()`` only if ``ts_col`` is known
    unique per user.
    """
    tiebreaks = [c for c in tiebreak_cols if c in df.columns]
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreaks]
    )
    # cast: unix_micros requires TIMESTAMP; parquet may carry TIMESTAMP_NTZ
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def streaming_session_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """True streaming sessions via ``session_window`` + watermark."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: drop repeats of ``keys`` arriving
    within the watermark horizon.

    ``dropDuplicates`` keyed on the id columns with a watermark bounds
    the dedup state: keys older than the watermark are evicted, so
    state is O(keys per horizon), not O(all keys ever). The batch twin
    (same call, no watermark) is exact. This is the ingestion guard in
    front of at-least-once sources (Kafka, file re-drops).
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
