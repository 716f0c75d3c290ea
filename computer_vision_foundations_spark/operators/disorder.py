"""Event-time disorder audit — the measurement behind a watermark.

Structured Streaming's `withWatermark(delay)` (streaming/windows.py)
trades completeness against state: events later than ``delay`` behind
the max-seen event time are dropped. The right delay is an EMPIRICAL
property of the feed — this operator measures it from a replayable
log: for each event, its LATENESS = how far its event time lags the
maximum event time among earlier-ARRIVING events of the same ingest
key (arrival order = the monotonic ingest id; event time = ts), then
the distribution (out-of-order fraction, p50/p95 via explicit
ceil-rank selection, max). Read "p95_late" as "a watermark of that
delay keeps 95% of late events".

Per-KEY disorder, deliberately: a global arrival order is a
single-sequence notion that does not exist on a 1000-executor ingest
— real feeds measure disorder per shard/partition key and take the
max over keys (the watermark must cover the worst shard). The
per-key running max is one partitioned window; everything global is
rank selection over the |late-events| lateness values.

All arithmetic is exact integer microseconds; the quantiles are ORDER
STATISTICS (value at rank ceil(q·n), ties broken by value order), not
interpolated — replayable bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["event_disorder_stats", "disorder_oracle_sql"]


def event_disorder_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    arrival_col: str,
    tiebreak_col: str | None = None,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """One row: ``n_events, n_late, frac_late`` + one ``p{q}_late_us``
    column per requested quantile (over LATE events only — NULL when
    the feed has no late events, matching the oracle's empty
    subselects) + ``max_late_us``.

    ``tiebreak_col`` resolves equal arrival values deterministically
    (pass the unique ingest id); the quantile VALUE is tie-stable
    regardless (equal lateness values are adjacent in rank order)."""
    order = [F.col(arrival_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = df.select(
        (F.max(us).over(w) - us).alias("late_us")
    )
    lates = late.where(F.col("late_us") > 0)
    wr = Window.orderBy("late_us")
    ranked = lates.select(
        "late_us", F.row_number().over(wr).alias("_r")
    )
    n_late = lates.agg(
        F.count(F.lit(1)).alias("n_late"),
        F.max("late_us").alias("max_late_us"),
    )
    total = late.agg(F.count(F.lit(1)).alias("n_events"))
    out = total.join(F.broadcast(n_late))
    for q in qs:
        # agg(max) over the <=1 matching row: empty input still yields
        # ONE row (NULL), so a disorder-free feed reports NULL
        # percentiles instead of annihilating the cross join
        pick = (
            ranked.join(F.broadcast(n_late.select("n_late")))
            .where(F.col("_r") == F.ceil(F.lit(q) * F.col("n_late")))
            .agg(F.max("late_us").alias(f"p{int(q * 100)}_late_us"))
        )
        out = out.join(F.broadcast(pick))
    return out.select(
        "n_events",
        "n_late",
        F.round(
            F.col("n_late").cast("double") / F.col("n_events").cast("double"),
            6,
        ).alias("frac_late"),
        *[f"p{int(q * 100)}_late_us" for q in qs],
        "max_late_us",
    )


def disorder_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    tiebreak_col: str | None = None,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> str:
    """DuckDB twin — identical per-key running max, identical
    ceil-rank order-statistic selection."""
    pcols = ", ".join(
        f"""(SELECT max(late_us) FROM (
               SELECT late_us, row_number() OVER (ORDER BY late_us) AS _r
               FROM lates)
             WHERE _r = ceil({q!r} * (SELECT count(*) FROM lates)))
            AS p{int(q * 100)}_late_us"""
        for q in qs
    )
    tb = f", {tiebreak_col}" if tiebreak_col else ""
    return f"""
    WITH l AS (
        SELECT max(epoch_us({ts_col})) OVER (
                   PARTITION BY {key_col} ORDER BY {arrival_col}{tb}
                   ROWS UNBOUNDED PRECEDING)
               - epoch_us({ts_col}) AS late_us
        FROM {table}
    ), lates AS (
        SELECT late_us FROM l WHERE late_us > 0
    )
    SELECT (SELECT count(*) FROM l) AS n_events,
           (SELECT count(*) FROM lates) AS n_late,
           round(CAST((SELECT count(*) FROM lates) AS DOUBLE)
                 / CAST((SELECT count(*) FROM l) AS DOUBLE), 6) AS frac_late,
           {pcols},
           (SELECT max(late_us) FROM lates) AS max_late_us
    """
