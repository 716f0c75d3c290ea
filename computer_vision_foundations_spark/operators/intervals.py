"""Interval merge (gaps-and-islands) — union length of overlapping
per-key intervals.

"How much wall-clock was this user actually active?" cannot be
answered by summing per-event windows — overlaps double-count. The
classical fix merges each key's intervals into maximal disjoint
ISLANDS first: an interval starts a new island iff its start exceeds
the running maximum of all previous ends (the running max, not just
the previous end — an earlier long interval can swallow several later
short ones). Integer (microsecond) arithmetic end to end: coverage
sums are exact BIGINTs, no float drift for the oracle to disagree on.

Spark-first shape: two window passes over the same (key, start,
tiebreak) sort order — Catalyst collapses them into ONE sort/shuffle
— then one island aggregate and one key aggregate. No self-joins on
time ranges (the O(n²) trap this operator exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interval_coverage", "interval_coverage_oracle_sql"]


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str | Column,
    end_col: str | Column,
    tiebreak_col: str,
) -> DataFrame:
    """``(key, n_islands, covered, longest)`` — merged-interval count,
    total union length, and longest island per key. ``start/end`` are
    numeric (any unit); ``tiebreak_col`` makes the sort total."""
    st = F.col(start_col) if isinstance(start_col, str) else start_col
    en = F.col(end_col) if isinstance(end_col, str) else end_col
    base = df.select(
        F.col(key_col).alias("_k"),
        st.alias("_st"),
        en.alias("_en"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w = Window.partitionBy("_k").orderBy("_st", "_tb")
    prev_max_end = F.max("_en").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = base.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col("_st") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = tagged.groupBy("_k", "_island").agg(
        F.min("_st").alias("_ist"), F.max("_en").alias("_ien")
    )
    return islands.groupBy(F.col("_k").alias("key")).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("_ien") - F.col("_ist")).alias("covered"),
        F.max(F.col("_ien") - F.col("_ist")).alias("longest"),
    )


def interval_coverage_oracle_sql(
    source_sql: str,
) -> str:
    """DuckDB twin over ``source_sql`` yielding ``(k, st, en, tb)``."""
    return f"""
    WITH base AS ({source_sql}),
    tagged AS (
      SELECT k, st, en,
             CASE WHEN max(en) OVER (PARTITION BY k ORDER BY st, tb
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR st > max(en) OVER (PARTITION BY k ORDER BY st, tb
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island,
             st AS o_st, tb AS o_tb
      FROM base),
    numbered AS (
      SELECT k, st, en,
             sum(new_island) OVER (PARTITION BY k ORDER BY o_st, o_tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM tagged),
    islands AS (
      SELECT k, island, min(st) AS ist, max(en) AS ien
      FROM numbered GROUP BY k, island)
    SELECT k AS key,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(ien - ist) AS BIGINT) AS covered,
           CAST(max(ien - ist) AS BIGINT) AS longest
    FROM islands GROUP BY k
    """
