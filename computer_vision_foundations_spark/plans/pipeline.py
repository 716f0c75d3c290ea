"""Typed pipeline configuration — the engine's only custom "IR".

The reference threads a plain config dict through every notebook
(`01_Configuration.py:12-49`). We replace it with frozen dataclasses
that compile to DataFrame pipelines (SURVEY §3: "pipeline-spec
dataclasses … which compile to a DataFrame"). No custom planner —
a spec is just the declarative arguments of sources/operators/sinks;
Catalyst owns the plan.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field


@dataclass(frozen=True)
class IngestConfig:
    """Where files land and how they are admitted (reference S1)."""

    input_path: str
    glob: str = "*.jpg"
    recursive: bool = True
    max_files_per_trigger: int | None = None
    ts_format: str | None = None
    # merge the source's one-partition-per-file splits (no shuffle);
    # see sources/binaryfile.read_binary_stream — set ~2× cores for
    # small-file landing zones, None for large files
    coalesce_partitions: int | None = None


@dataclass(frozen=True)
class SinkConfig:
    """Where the enriched stream is persisted (reference S2/S3)."""

    output_path: str
    checkpoint_path: str
    format: str = "parquet"
    partition_by: tuple[str, ...] = ()
    # Repartition each micro-batch by the partition columns before the
    # file write, so each output partition gets ONE file per batch
    # instead of one per (task × partition) — the OSS equivalent of
    # Delta's optimized writes. Costs a shuffle of the batch (including
    # any binary payload); leave False when the landing zone is already
    # partition-aligned (e.g. date-bucketed prefixes) and each batch
    # touches a single partition value.
    optimize_write: bool = False

    def reset_checkpoint(self) -> None:
        """The reference's checkpoint-reset procedure
        (`02_Data Ingest.py:26-31`) as a tested API."""
        if os.path.exists(self.checkpoint_path):
            shutil.rmtree(self.checkpoint_path)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end ingest pipeline spec (mirrors `01_Configuration.py`)."""

    ingest: IngestConfig
    sink: SinkConfig
    database: str = "cv"
    images_table: str = "images"
    scored_table: str = "scored_images"
    extract_metadata: bool = True
    extract_statistics: bool = True
    extra: dict = field(default_factory=dict, hash=False, compare=False)
