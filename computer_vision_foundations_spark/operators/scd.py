"""Slowly-changing-dimension (SCD Type 2) history construction.

The warehouse-dimensional counterpart to the engine's CDC reader
(`sources/acid.py:table_changes`): given a change stream of
``(entity, ts, attribute)`` observations, build the validity-interval
history — one row per attribute EPISODE with ``valid_from``,
``valid_to`` (NULL while current) and ``is_current``. Consecutive
observations with an unchanged attribute collapse into one episode
(the defining SCD2 rule: re-observing the same value is not a
change).

Pure window algebra, identical in any engine:

- flag episode starts: ``attr ≠ lag(attr)`` (or first row) per
  entity ordered by (ts, tiebreak);
- keep start rows; ``valid_to = lead(valid_from)`` over the
  surviving starts.

Spark-first shape: one shuffle on the entity key shared by both
windows (lag-based change detection, lead-based interval close). No
UDF, no self-join — the naive "join each row to its successor"
formulation shuffles twice and breaks on duplicate timestamps; the
tiebreaker column makes the episode order total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history", "scd2_oracle_sql"]


def scd2_history(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(entity, attr, valid_from, valid_to, is_current)`` — one row
    per collapsed attribute episode."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    flagged = df.select(
        F.col(entity_col).alias("entity"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_start"),
        F.col(tiebreak_col).alias("_tb"),
    )
    starts = flagged.where(F.col("_start") == 1)
    w2 = Window.partitionBy("entity").orderBy("valid_from", "_tb")
    return (
        starts.select(
            "entity",
            "attr",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
        )
        .withColumn(
            "is_current", F.col("valid_to").isNull()
        )
        .orderBy("entity", "valid_from")
    )


def scd2_oracle_sql(
    table: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin — identical change-flag + interval-close windows."""
    return f"""
    WITH flagged AS (
        SELECT {entity_col} AS entity, {attr_col} AS attr,
               {ts_col} AS valid_from, {tiebreak_col} AS _tb,
               CASE WHEN lag({attr_col}) OVER w IS NULL
                         OR lag({attr_col}) OVER w <> {attr_col}
                    THEN 1 ELSE 0 END AS _start
        FROM {table}
        WINDOW w AS (PARTITION BY {entity_col}
                     ORDER BY {ts_col}, {tiebreak_col})
    ), starts AS (
        SELECT * FROM flagged WHERE _start = 1
    )
    SELECT entity, attr, valid_from,
           lead(valid_from) OVER (
               PARTITION BY entity ORDER BY valid_from, _tb
           ) AS valid_to,
           lead(valid_from) OVER (
               PARTITION BY entity ORDER BY valid_from, _tb
           ) IS NULL AS is_current
    FROM starts ORDER BY entity, valid_from
    """
