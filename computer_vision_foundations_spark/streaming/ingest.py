"""Structured-streaming ingest & inference pipelines.

EP1 (ingest) and EP3 (streaming inference) of the reference, rebuilt on
OSS Spark:

- source: ``binaryFile`` stream with glob + recursion + file-count
  admission (reference Auto Loader, `02_Data Ingest.py:62-76`)
- enrich: filename parse (`02_Data Ingest.py:93-100`) → metadata /
  statistics pandas UDFs (`02_Data Ingest.py:209-212,257-260`)
- sink: partitioned parquet append with checkpoint,
  ``trigger(availableNow=True)`` — the modern form of the reference's
  ``trigger(once=True)`` incremental-batch pattern
  (`02_Data Ingest.py:273-282`). Delta drops in when available; the
  engine only requires an append-capable, checkpointed format.

Scale notes: the huge binary ``content`` column is the payload and is
written through by design (as in the reference) — but every *wide*
operation in this module is projection-disciplined so content never
enters a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.filename import with_parsed_filename
from computer_vision_foundations_spark.functions.image import (
    with_image_metadata,
    with_image_metadata_statistics,
    with_image_statistics,
)
from computer_vision_foundations_spark.plans.pipeline import PipelineConfig
from computer_vision_foundations_spark.sources.binaryfile import read_binary_stream


def build_ingest_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Source → parse → enrich, as an unstarted streaming DataFrame."""
    df = read_binary_stream(
        spark,
        cfg.ingest.input_path,
        glob=cfg.ingest.glob,
        recursive=cfg.ingest.recursive,
        max_files_per_trigger=cfg.ingest.max_files_per_trigger,
        coalesce_partitions=cfg.ingest.coalesce_partitions,
    )
    df = with_parsed_filename(df, ts_format=cfg.ingest.ts_format)
    if cfg.extract_metadata and cfg.extract_statistics:
        # one fused Python pass: content crosses the Arrow boundary
        # once instead of twice (r13, guide §4.1; outputs identical)
        df = with_image_metadata_statistics(df)
    elif cfg.extract_metadata:
        df = with_image_metadata(df)
    elif cfg.extract_statistics:
        df = with_image_statistics(df)
    return df


def run_ingest(spark: SparkSession, cfg: PipelineConfig) -> None:
    """Run one availableNow cycle of the ingest stream to the sink.

    Exactly-once across restarts via the checkpoint; re-running picks
    up only files not yet committed (reference ST1-ST4 semantics).
    """
    df = build_ingest_stream(spark, cfg)
    if cfg.sink.optimize_write and cfg.sink.partition_by:
        # one output file per partition value per batch (see SinkConfig)
        df = df.repartition(*[F.col(c) for c in cfg.sink.partition_by])
    writer = (
        df.writeStream.format(cfg.sink.format)
        .outputMode("append")
        .option("checkpointLocation", cfg.sink.checkpoint_path)
        .option("path", cfg.sink.output_path)
        .trigger(availableNow=True)
    )
    if cfg.sink.partition_by:
        writer = writer.partitionBy(*cfg.sink.partition_by)
    query = writer.start()
    query.awaitTermination()


def run_ingest_interrupted(
    spark: SparkSession,
    cfg: PipelineConfig,
    stop_after_batches: int = 1,
    poll_sec: float = 0.25,
    timeout_sec: float = 300.0,
) -> int:
    """Start the ingest stream, then STOP it after
    ``stop_after_batches`` committed micro-batches — a deterministic
    stand-in for an executor/driver crash mid-backlog. Returns the
    number of input-bearing batches that committed before the stop.

    Restart semantics under test (ST3): the checkpoint's offset log
    records which files each batch admitted and the parquet sink's
    ``_spark_metadata`` commit log makes batch output atomic, so a
    subsequent :func:`run_ingest` on the SAME checkpoint re-admits
    only unprocessed files and the union of outputs is exactly-once —
    no duplicates from any half-written batch, no losses from the
    admitted-but-uncommitted tail."""
    import time as _time

    df = build_ingest_stream(spark, cfg)
    if cfg.sink.optimize_write and cfg.sink.partition_by:
        df = df.repartition(*[F.col(c) for c in cfg.sink.partition_by])
    writer = (
        df.writeStream.format(cfg.sink.format)
        .outputMode("append")
        .option("checkpointLocation", cfg.sink.checkpoint_path)
        .option("path", cfg.sink.output_path)
        .trigger(availableNow=True)
    )
    if cfg.sink.partition_by:
        writer = writer.partitionBy(*cfg.sink.partition_by)
    query = writer.start()
    deadline = _time.time() + timeout_sec
    try:
        while _time.time() < deadline and query.isActive:
            done = [
                p
                for p in query.recentProgress
                if p.get("numInputRows", 0) > 0
            ]
            if len(done) >= stop_after_batches:
                break
            _time.sleep(poll_sec)
        committed = len(
            [p for p in query.recentProgress if p.get("numInputRows", 0) > 0]
        )
    finally:
        query.stop()
        query.awaitTermination()
    return committed


def run_scoring_stream(
    spark: SparkSession,
    cfg: PipelineConfig,
    predict_fn,
    output_path: str,
    checkpoint_path: str,
) -> None:
    """EP3: second consumer of the landing dir → (path, score) parquet.

    Own checkpoint (independent stream progress, as the reference's
    second Auto Loader consumer, `04a_Model Deployment.py:248-269`).
    """
    from computer_vision_foundations_spark.operators.score import score_with

    df = read_binary_stream(
        spark,
        cfg.ingest.input_path,
        glob=cfg.ingest.glob,
        recursive=cfg.ingest.recursive,
        max_files_per_trigger=cfg.ingest.max_files_per_trigger,
        coalesce_partitions=cfg.ingest.coalesce_partitions,
    )
    scored = score_with(df, predict_fn).select("path", "score")
    (
        scored.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .option("path", output_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
