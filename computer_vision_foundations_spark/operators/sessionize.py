"""Batch sessionization: gap-based session ids + per-session rollups.

The batch twin of `streaming/windows.py::sessionized` (session
windows with a watermark): given an event log, assign every event a
per-user session index — a new session starts when the gap since the
user's previous event exceeds ``gap``; then roll sessions up to the
(user, session) grain. This is the first aggregation every
behavioral/funnel pipeline runs, and at training-data scale it is the
canonical "turn 100 TB of raw events into bounded session documents"
step.

Determinism contract: event order within a user is (ts, id) — the id
tiebreak makes the lag/cumsum recurrence a pure function of the data
even when two events share a timestamp. All time arithmetic is EXACT
INTEGER MICROSECONDS (``unix_micros`` on Spark, ``epoch_us`` on
DuckDB — both lossless at timestamp precision), so no float, no
truncation-convention mismatch (engines disagree on fractional
second-diff conventions; they cannot disagree on microsecond
integers).

Spark-first shape: ONE shuffle, reused twice — the lag window, the
cumulative-sum window, and the (user, sid) groupBy all share the
``user`` hash partitioning, so Catalyst plans a single exchange; rows
carried are (user, ts-as-long, id, type) only. At 1000 executors this
is the textbook sessionize plan: shuffle once by user, everything
else partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "session_oracle_sql"]


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
    out_col: str = "session_idx",
) -> DataFrame:
    """Input rows + ``out_col``: 1-based session index per user.

    New session ⇔ no previous event OR strictly more than
    ``gap_seconds`` since it (boundary exactly == gap stays in the
    same session — documented, oracle-identical).

    NULL timestamps: rows with NULL ``ts_col`` are ORDER-AMBIGUOUS
    across engines (Spark sorts NULLS FIRST ascending, DuckDB NULLS
    LAST), so the differential contract only holds on non-null
    timestamps — filter them upstream if the source can contain any
    (the fixture event log cannot).
    """
    # parquet TIMESTAMP_NTZ: cast to TIMESTAMP under the engine's fixed
    # UTC session zone — wall-clock-identical, so unix_micros equals
    # DuckDB's epoch_us on the naive value
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(us).over(w)
    brk = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_seconds * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(brk).over(wcum).cast("int"))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """``(user, session_idx, n_events, duration_us, n_types)`` —
    one row per session; duration is exact integer microseconds."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(F.col(user_col).alias("user"), "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
            F.countDistinct(type_col).alias("n_types"),
        )
        .orderBy("user", "session_idx")
    )


def session_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
) -> str:
    """DuckDB twin — identical (ts, id) ordering, identical integer-
    microsecond gap test, identical cumulative-sum recurrence."""
    gap_us = gap_seconds * 1_000_000
    return f"""
    WITH l AS (
        SELECT {user_col} AS u, {ts_col} AS ts, {id_col} AS eid,
               {type_col} AS et,
               epoch_us({ts_col}) AS us,
               lag(epoch_us({ts_col})) OVER (
                   PARTITION BY {user_col}
                   ORDER BY {ts_col}, {id_col}) AS prev
        FROM {table}
    ), f AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > {gap_us}
                       THEN 1 ELSE 0 END AS brk
        FROM l
    ), s AS (
        SELECT *, CAST(sum(brk) OVER (
                   PARTITION BY u ORDER BY ts, eid
                   ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
        FROM f
    )
    SELECT u AS "user", session_idx,
           count(*) AS n_events,
           max(us) - min(us) AS duration_us,
           CAST(count(DISTINCT et) AS BIGINT) AS n_types
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """
