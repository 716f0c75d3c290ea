"""Consecutive-sequence pattern mining over per-user event streams.

The ordered counterpart of market-basket rules (operators/basket.py):
a basket rule says "users who do A also do B", a sequential pattern
says "users do A THEN B (then C)". Mined here as CONSECUTIVE
event-type n-grams per user timeline — the PrefixSpan level-1/2
patterns that cover funnel discovery and next-event modelling — with
both raw occurrence counts and user support (distinct users
exhibiting the pattern), the two numbers any support/confidence
downstream needs.

Spark-first shape: one per-user window pass (``lead`` ×(n−1)) turns
the timeline into pattern rows in place — no self-joins on time, no
explode; then one hash aggregate per pattern with a distinct-user
count. Exactly two shuffles total (window + aggregate), independent
of pattern length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["consecutive_patterns", "consecutive_patterns_oracle_sql"]


def consecutive_patterns(
    events: DataFrame,
    lengths: tuple[int, ...] = (2, 3),
    min_users: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(n, pattern, n_occurrences, n_users)`` — consecutive
    event-type n-grams (``'a>b'``) per user timeline, for each n in
    ``lengths``, kept when at least ``min_users`` distinct users show
    the pattern."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, max(lengths))
    ]
    base = events.select(
        F.col(user_col).alias("_u"), *[
            s.alias(f"_s{i}") for i, s in enumerate(steps)
        ]
    )
    per_len = []
    for n in lengths:
        pat = F.concat_ws(">", *[F.col(f"_s{i}") for i in range(n)])
        per_len.append(
            base.filter(F.col(f"_s{n - 1}").isNotNull())
            .select(F.lit(n).alias("n"), pat.alias("pattern"), "_u")
        )
    allp = per_len[0]
    for p in per_len[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("n", "pattern")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("_u").alias("n_users"),
        )
        .filter(F.col("n_users") >= min_users)
    )


def consecutive_patterns_oracle_sql(
    table: str = "events",
    lengths: tuple[int, ...] = (2, 3),
    min_users: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin: identical lead window + aggregate."""
    leads = ",\n".join(
        f"lead({type_col}, {i}) OVER w AS s{i}"
        for i in range(1, max(lengths))
    )
    branches = []
    for n in lengths:
        cols = [type_col] + [f"s{i}" for i in range(1, n)]
        pat = " || '>' || ".join(cols)
        branches.append(
            f"SELECT {n} AS n, {pat} AS pattern, {user_col} AS u"
            f" FROM stepped WHERE s{n - 1} IS NOT NULL"
        )
    return f"""
    WITH stepped AS (
      SELECT {user_col}, {type_col},
             {leads}
      FROM {table}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {tiebreak_col})
    )
    SELECT n, pattern,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT u) AS BIGINT) AS n_users
    FROM ({" UNION ALL ".join(branches)}) pats
    GROUP BY n, pattern
    HAVING count(DISTINCT u) >= {min_users}
    """
