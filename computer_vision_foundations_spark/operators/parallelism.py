"""Guarded scan-parallelism widening for CPU-bound projections.

A parquet file is split at ROW-GROUP granularity; a single-file,
single-row-group input therefore arrives as ONE partition no matter
how many cores the cluster has, and every CPU-bound per-row
projection downstream (hashing, fingerprinting, tokenize+vote) runs
serially on one core. That is a small-input artifact — at 100 TB a
table is thousands of files × row groups and the scan is already as
wide as the cluster — but it is exactly the regime local benchmarks
(and small lookup/side tables on real clusters) live in.

``widen_if_under_parallel`` repartitions ONLY when the input has
fewer partitions than the cluster's default parallelism, so:

- at scale it is a provable no-op (condition false, no shuffle added,
  plans unchanged);
- under-parallel inputs pay one narrow round-robin exchange to unlock
  N-core execution of whatever follows.

Call it just BEFORE the expensive projection, on the narrowest
possible frame (ids + the columns the projection needs), so the
exchange moves as few bytes as possible. The check costs one
driver-side plan evaluation (``df.rdd.getNumPartitions()``), no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["widen_if_under_parallel"]


def widen_if_under_parallel(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``parts`` (default: the session's
    ``defaultParallelism``) iff it currently has fewer partitions."""
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
