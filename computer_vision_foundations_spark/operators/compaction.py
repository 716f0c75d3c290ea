"""File-compaction planning: pack small files into target-size groups.

The table-maintenance twin of OPTIMIZE/auto-compaction (the reference
platform runs it implicitly; `sources/acid.py` exposes z-order +
vacuum): a 100 TB table accretes small files from streaming ingest,
and read amplification is governed by files-per-task — the fix is a
PLAN that assigns contiguous runs of key-sorted files to groups of
~``target_bytes``. Contiguity matters: for sorted/z-ordered layouts,
packing arbitrary files together would destroy the clustering that
data-skipping (za31_data_skipping) relies on, so the planner bins the
PREFIX-SUM of bytes in key order — the group of a file is
``floor(cum_before / target)`` — and every group is a contiguous key
range whose files merge into one ~target-sized output.

Determinism contract: groups are a pure function of the (key-sorted)
listing — integer byte sums, no heuristics, same recurrence in the
oracle. A greedy first-fit-decreasing packer gives marginally fuller
bins but is order-dependent and clustering-destroying; prefix-sum
binning is what production compactors (and sort-based writers) do.

Spark-first shape: one global sort of the FILE LISTING (metadata
rows — thousands per 100 TB table, never data), one running-sum
window, one group aggregate. The data files themselves move only in
the rewrite job this plan feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["compaction_plan", "compaction_oracle_sql"]


def compaction_plan(
    files: DataFrame,
    key_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """``(group_id, n_files, group_bytes, min_key, max_key)`` —
    contiguous key-ordered groups with ~``target_bytes`` each.

    group_id = floor(exclusive-prefix-sum(bytes) / target): a file
    whose cumulative start crosses a target boundary opens the next
    group, so every group's byte total lies in
    (target − max_file, target + max_file).

    ``key_col`` MUST be unique per file (a path or range id — true of
    any real listing): the running sum orders by it alone, and
    duplicate keys would make the prefix sum tie-order-dependent
    across engines."""
    w = Window.orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_incl = F.sum(F.col(bytes_col)).over(w)
    gid = F.floor(
        (cum_incl - F.col(bytes_col)).cast("double") / F.lit(float(target_bytes))
    ).cast("long")
    return (
        files.select(
            F.col(key_col).alias("key"),
            F.col(bytes_col).alias("bytes"),
            gid.alias("group_id"),
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("group_bytes"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
        .orderBy("group_id")
    )


def compaction_oracle_sql(
    src_sql: str,
    target_bytes: int,
) -> str:
    """DuckDB twin over a source yielding ``(key, bytes)`` — identical
    exclusive-prefix-sum binning."""
    return f"""
    WITH f AS (
        SELECT key, bytes,
               sum(bytes) OVER (ORDER BY key
                                ROWS UNBOUNDED PRECEDING) - bytes AS cum0
        FROM ({src_sql})
    )
    SELECT CAST(floor(CAST(cum0 AS DOUBLE) / {float(target_bytes)!r})
                AS BIGINT) AS group_id,
           count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS group_bytes,
           min(key) AS min_key,
           max(key) AS max_key
    FROM f GROUP BY 1 ORDER BY 1
    """
