"""Incremental change-data-feed consumption (streaming/cdf.py):
offset checkpointing, bounded windows, at-least-once replay
idempotency, and the mid-window schema-change refusal pass-through."""

import os

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw
from computer_vision_foundations_spark.streaming import cdf


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k long, v string"
    )


def _feed(spark, out):
    return sorted(
        (r["k"], r["_change_type"], int(r["_commit_version"]))
        for r in cdf.read_cdf_output(spark, out).collect()
    )


def test_incremental_drain_matches_batch_feed(spark, tmp_path):
    root, out, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    dw.delta_create(spark, root, _mk(spark, 0, 10).repartition(2))   # v0
    dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True)  # v1
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 1
    assert cdf.cdf_offset(ckpt) == 1
    dw.delta_append(spark, root, _mk(spark, 20, 24))                  # v2
    dw.delta_delete_where(spark, root, F.col("k") == 21, use_dvs=True)  # v3
    # bounded window: two triggers of one version each
    assert (
        cdf.cdf_process_available(
            spark, root, out, ckpt, max_versions_per_trigger=1
        )
        == 2
    )
    batch = sorted(
        (r["k"], r["_change_type"], int(r["_commit_version"]))
        for r in dr.delta_row_changes(spark, root, 0, 3).collect()
    )
    assert _feed(spark, out) == batch
    # caught up: another drain is a no-op
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 0


def test_replay_is_idempotent(spark, tmp_path):
    root, out, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    dw.delta_create(spark, root, _mk(spark, 0, 8).repartition(2))
    dw.delta_delete_where(spark, root, F.col("k") % 2 == 0, use_dvs=True)
    dw.delta_append(spark, root, _mk(spark, 30, 33))
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 2
    want = _feed(spark, out)
    # simulate a crash BEFORE the offset advanced: rewind and re-drain
    cdf._write_offset(ckpt, 0)
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 2
    assert _feed(spark, out) == want


def test_optimize_advances_offset_without_rows(spark, tmp_path):
    root, out, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    dw.delta_create(spark, root, _mk(spark, 0, 6).repartition(3))
    dw.delta_append(spark, root, _mk(spark, 10, 12))                 # v1
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 1
    n_before = len(_feed(spark, out))
    v = dw.delta_optimize(spark, root, small_file_bytes=10**9)       # v2
    assert v == 2
    assert cdf.cdf_process_available(spark, root, out, ckpt) == 1
    assert cdf.cdf_offset(ckpt) == 2
    assert len(_feed(spark, out)) == n_before  # dataChange=false


def test_schema_change_mid_window_refuses(spark, tmp_path):
    root, out, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    dw.delta_create(spark, root, _mk(spark, 0, 4))
    dw.delta_append(
        spark,
        root,
        _mk(spark, 10, 12).withColumn("extra", F.lit(1)),
        merge_schema=True,
    )
    with pytest.raises(dr.DeltaProtocolError, match="schema-changing"):
        cdf.cdf_process_available(spark, root, out, ckpt)
    # offset untouched: nothing was half-consumed
    assert cdf.cdf_offset(ckpt) is None
