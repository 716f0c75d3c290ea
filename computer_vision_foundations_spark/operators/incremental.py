"""Incremental aggregate maintenance: merge a delta into a snapshot.

The lakehouse pattern behind every "keep the dashboard aggregate
fresh without recomputing history" job: grouped counts/sums are
COMMUTATIVE MONOIDS, so yesterday's materialized aggregate plus
today's delta aggregate merge with a full-outer join + coalesced
addition — no history re-scan. This operator is the batch core the
streaming upsert sink (`streaming/upsert.py`) applies per
micro-batch; registered standalone because its correctness statement
is the strongest differential form available: *merged(snapshot(<t),
delta(≥t)) must equal recompute(all)* — the oracle IS the full
recomputation, so any drift between the incremental path and the
ground truth hash-fails.

Spark-first shape: both inputs aggregate map-side first (partial
aggregation), then one keyed full-outer join of two
|groups|-sized tables — the fact table is scanned once per side,
never twice, and the join is group-sized, not row-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_snapshot", "merge_grouped", "incremental_oracle_sql"]


def grouped_snapshot(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """``(*keys, n, total)`` — the materialized grouped aggregate."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("total"),
    )


def merge_grouped(
    snapshot: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Monoid merge of two grouped aggregates (same schema):
    full-outer on the keys, counts and totals added with 0-coalesce."""
    s = snapshot.select(
        *keys,
        F.col("n").alias("_sn"),
        F.col("total").alias("_st"),
    )
    d = delta.select(
        *keys,
        F.col("n").alias("_dn"),
        F.col("total").alias("_dt"),
    )
    return s.join(d, keys, "full").select(
        *keys,
        (
            F.coalesce(F.col("_sn"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("_st"), F.lit(0.0))
            + F.coalesce(F.col("_dt"), F.lit(0.0))
        ).alias("total"),
    )


def incremental_oracle_sql(
    table: str = "events",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    round_digits: int = 2,
) -> str:
    """The ground truth the incremental path must reproduce: the full
    recompute over ALL rows (deliberately NOT a replay of the
    merge — this is the semantic statement, not the mechanism)."""
    ks = ", ".join(keys)
    return f"""
    SELECT {ks}, count(*) AS n,
           round(sum(CAST({value_col} AS DOUBLE)), {round_digits})
               AS total
    FROM {table}
    GROUP BY {ks} ORDER BY {ks}
    """
