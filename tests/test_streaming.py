"""Streaming ingest: availableNow file stream → parquet sink with
checkpoint-restart idempotence (reference ST1-ST4,
`02_Data Ingest.py:26-31,273-282`)."""

import os

from computer_vision_foundations_spark.plans.pipeline import (
    IngestConfig,
    PipelineConfig,
    SinkConfig,
)
from computer_vision_foundations_spark.streaming.ingest import run_ingest


def _drop_file(landing, name, payload=b"x" * 64):
    with open(os.path.join(landing, name), "wb") as f:
        f.write(payload)


def _cfg(tmp, with_udfs=False):
    # NB: Hadoop's local Path cannot contain ':' (URI scheme separator),
    # so unlike object-store keys the local fixture filenames use
    # 'HH-mm-ss' and pass an explicit ts_format.
    return PipelineConfig(
        ingest=IngestConfig(
            input_path=os.path.join(tmp, "landing"),
            glob="*.jpg",
            recursive=True,
            max_files_per_trigger=10,
            ts_format="yyyy-MM-dd HH-mm-ss",
        ),
        sink=SinkConfig(
            format="parquet",
            output_path=os.path.join(tmp, "out"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            partition_by=("date",),
        ),
        extract_metadata=with_udfs,
        extract_statistics=with_udfs,
    )


def test_ingest_available_now_and_restart(spark, tmp_path):
    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _drop_file(landing, "2024-05-01 10-00-00_cam_a_0.jpg")
    _drop_file(landing, "2024-05-01 11-00-00_cam_b_1.jpg")
    _drop_file(landing, "ignored.txt")  # glob-filtered out

    cfg = _cfg(tmp)
    run_ingest(spark, cfg)
    out1 = spark.read.parquet(cfg.sink.output_path)
    assert out1.count() == 2
    assert set(out1.select("label").toPandas()["label"]) == {0, 1}
    # partitioned layout on disk → partition pruning works
    assert any(d.startswith("date=") for d in os.listdir(cfg.sink.output_path))

    # restart with no new files: checkpoint makes it a no-op
    run_ingest(spark, cfg)
    assert spark.read.parquet(cfg.sink.output_path).count() == 2

    # drop one more file: only the delta is processed
    _drop_file(landing, "2024-05-02 09-00-00_cam_a_1.jpg")
    run_ingest(spark, cfg)
    out3 = spark.read.parquet(cfg.sink.output_path)
    assert out3.count() == 3


def test_ingest_with_image_udfs(spark, tmp_path):
    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _drop_file(landing, "2024-06-01 08-00-00_cam_c_1.jpg", b"fakejpgbytes" * 10)
    cfg = _cfg(tmp, with_udfs=True)
    run_ingest(spark, cfg)
    out = spark.read.parquet(cfg.sink.output_path)
    row = out.select("metadata.height", "statistics.entropy", "label").collect()[0]
    assert row.height >= 1 and row.entropy >= 0.0 and row.label == 1
