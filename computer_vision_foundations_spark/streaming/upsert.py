"""Keyed streaming upsert via ``foreachBatch`` — Delta-MERGE shape on
plain parquet.

The reference sinks its streams into Delta tables, where re-delivered
or revised records can be MERGEd by key. Open-source parquet has no
MERGE, so the idiomatic OSS replacement is a ``foreachBatch`` sink:
each micro-batch is reconciled against the existing table with plain
DataFrame ops and appended atomically-enough for the checkpoint to
guarantee at-least-once batch delivery + idempotent effect =
exactly-once table contents.

Two policies:

- ``insert_only``: drop batch rows whose key already exists (dedup
  append — re-deliveries and late duplicates are no-ops). The
  existing-key lookup reads ONLY the key columns from the sink
  (parquet column pruning), never the payload.
- ``replace_partitions``: dynamic partition overwrite — the batch's
  partitions are rewritten wholesale
  (``spark.sql.sources.partitionOverwriteMode=dynamic``), the
  standard parquet pattern for reprocessing a day/hour.

At scale the insert-only key lookup is a broadcast-able anti-join
when batches are small relative to history; if the sink grows to
billions of keys, partition the sink by a key prefix and push a
partition filter into the lookup (``key_partition_col``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["upsert_stream", "stream_upsert_acid", "last_committed_batch"]


def _existing_keys(spark: SparkSession, path: str, key_cols: list[str]):
    try:
        return spark.read.parquet(path).select(*key_cols).distinct()
    except Exception:
        return None  # first batch: sink does not exist yet


def upsert_stream(
    df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    mode: str = "insert_only",
    partition_by: list[str] | None = None,
):
    """Start an availableNow ``foreachBatch`` upsert of streaming
    ``df`` into ``output_path``; returns the finished StreamingQuery.

    ``mode='insert_only'`` anti-joins each batch against the sink's
    existing keys (and dedups within the batch, keeping an arbitrary
    single row per key — make batches key-unique upstream if that
    matters). ``mode='replace_partitions'`` requires ``partition_by``
    and overwrites only the partitions present in the batch.
    """
    if mode not in ("insert_only", "replace_partitions"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "replace_partitions" and not partition_by:
        raise ValueError("replace_partitions needs partition_by")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if mode == "insert_only":
            new_rows = batch.dropDuplicates(key_cols)
            existing = _existing_keys(spark, output_path, key_cols)
            if existing is not None:
                new_rows = new_rows.join(
                    F.broadcast(existing), on=key_cols, how="left_anti"
                )
            writer = new_rows.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(output_path)
        else:
            writer = (
                batch.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_by)
            )
            # first write must create the table dir for overwrite mode
            writer.parquet(output_path)

    query = (
        df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def last_committed_batch(root: str, app_id: str) -> int:
    """Highest micro-batch id this ``app_id`` has committed into the
    transactional table at ``root`` (−1 if none) — read from the
    commit log's ``meta.txn`` records, the same idempotence ledger
    log-structured formats keep for streaming writers."""
    from computer_vision_foundations_spark.sources.acid import (
        table_history,
    )

    for c in reversed(table_history(root)):
        txn = (c.get("meta") or {}).get("txn") or {}
        if app_id in txn:
            return int(txn[app_id])  # commits are ordered: newest wins
    return -1


def stream_upsert_acid(
    df: DataFrame,
    root: str,
    checkpoint_path: str,
    key_cols: list[str],
    app_id: str = "stream-upsert",
    max_txn_retries: int = 5,
):
    """Streaming MERGE into the transactional table format
    (``sources/acid.py``) with REPLAY-PROOF exactly-once: every
    micro-batch commits as one copy-on-write upsert whose commit
    record carries ``{"txn": {app_id: batch_id}}``. After a crash the
    checkpoint may re-deliver an already-applied batch — the sink
    consults the commit log first and SKIPS batch ids at or below the
    app's high-water mark, so replays are no-ops (the idempotent-sink
    half of exactly-once; Structured Streaming's checkpoint is the
    at-least-once half). Concurrent writers surface as
    ``TxnConflict``; the sink rebases and retries the batch up to
    ``max_txn_retries`` times.

    Runs availableNow and blocks until drained; returns the finished
    StreamingQuery.
    """
    from computer_vision_foundations_spark.sources.acid import (
        TxnConflict,
        create_table,
        upsert,
    )

    if max_txn_retries < 1:
        raise ValueError("max_txn_retries must be >= 1")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        import os

        if not os.path.isdir(
            os.path.join(root, "_txn_log")
        ):  # first ever batch creates the table — and records its txn
            # watermark, so a crash-replay of batch 0 is skipped too
            create_table(
                spark,
                root,
                batch.dropDuplicates(key_cols),
                meta={"txn": {app_id: int(batch_id)}},
            )
            return
        if batch_id <= last_committed_batch(root, app_id):
            return  # checkpoint replay of an applied batch: no-op
        meta = {"txn": {app_id: int(batch_id)}}
        updates = batch.dropDuplicates(key_cols)
        for attempt in range(max_txn_retries):
            try:
                upsert(spark, root, updates, key_cols, meta=meta)
                return
            except TxnConflict:
                if attempt == max_txn_retries - 1:
                    raise
                # another writer advanced the table: re-read and retry

    query = (
        df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
