"""Corpus snapshot diff — what changed between two dataset versions.

Dataset iteration (recrawl, refilter, redaction pass) needs an audit
of what a new corpus version did to the old one: rows added, removed,
modified (same id, different content), unchanged. A full-outer join
on the id with 16-byte content fingerprints on both sides — document
bodies are hashed map-side and never cross the join, so the diff of
two 100 TB versions shuffles (id, fingerprint) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_diff_counts"]


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, status)`` with status ∈ added | removed | modified |
    unchanged.

    Precondition: ``id_col`` is unique within each snapshot (the
    normal contract for a corpus snapshot keyed by document id).
    Duplicate ids would fan out in the full-outer join and yield
    multiple status rows per id; dedupe (e.g. ``dedup_exact`` or a
    ``groupBy(id).agg(max(text))``) before diffing if a snapshot can
    carry repeats."""
    fp = F.md5(F.col(text_col).cast("binary"))
    # explicit presence markers: a NULL text yields a NULL fingerprint,
    # which must NOT read as "row absent" — presence and content are
    # tracked separately so (id, NULL) vs (id, 'x') classifies as
    # modified, not added
    o = old_df.select(
        F.col(id_col), fp.alias("_old_fp"), F.lit(True).alias("_in_old")
    )
    n = new_df.select(
        F.col(id_col), fp.alias("_new_fp"), F.lit(True).alias("_in_new")
    )
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("_old_fp").eqNullSafe(F.col("_new_fp")), F.lit("modified")
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def snapshot_diff_counts(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(status, n)`` — the four-row audit summary.  Same unique-id
    precondition as :func:`snapshot_diff`."""
    return (
        snapshot_diff(old_df, new_df, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
