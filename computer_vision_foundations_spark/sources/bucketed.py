"""Bucketed tables: pre-shuffled storage for shuffle-free joins/aggs.

The core 100 TB lever this module adds: ``bucketBy`` at write time
hash-partitions rows into a fixed number of files per the bucket key,
and Spark's file-source relation records that layout in the catalog.
Every later equi-join or aggregation ON THE BUCKET KEY between tables
with compatible bucket counts then runs WITHOUT an Exchange — the
most expensive operator in a petabyte plan is simply absent, paid
once at ingest instead of once per query. (Public Spark feature:
`DataFrameWriter.bucketBy`, SPARK-12538; requires ``saveAsTable`` —
path-only saves can't carry bucket metadata.)

Sizing guidance (documented for the 1000-executor target): pick
``n_buckets`` so one bucket of the FACT table ≈ 128–512 MB
(e.g. 100 TB / 256 MB ≈ 400 k buckets is too many files — bucket the
join key at 8–32 k and let AQE coalesce post-join stages instead);
dimension sides either broadcast (no bucketing needed) or share the
fact's bucket count so the join stays co-located. Bucket counts must
match (or one be a divisor of the other with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

Reference parity: the reference stores training tables as cloud Delta
tables and re-shuffles per query; bucketing is the OSS-Spark-native
answer for repeated joins on a stable key (SURVEY §2.1 S4 catalog
scans + §2.3 joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join", "plan_has_exchange"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed parquet table in the session catalog.

    ``sort_cols`` additionally sorts within each bucket file, which
    lets a later sort-merge join skip its per-partition Sort too.
    ``path`` pins the table directory (otherwise the warehouse dir).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two cataloged bucketed tables on their bucket key.

    The ``merge`` hint pins a sort-merge join (a tiny test table would
    otherwise broadcast, hiding the bucket layout); with matching
    bucket counts on the join key the physical plan contains NO
    Exchange on either side — verify with ``plan_has_exchange``.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on=on, how=how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains any Exchange (shuffle or
    broadcast) — the property bucketed joins exist to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
