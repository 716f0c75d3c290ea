"""Video scene-cut detection over decoded frame streams.

Shot-boundary detection is the first structuring pass of any video
training pipeline (frame sampling for vision-language pretraining
keeps one frame per shot, not per second): a cut is declared where
consecutive frames' content distance spikes. The classic signal is an
absolute difference of per-frame intensity statistics (Boreczky &
Rowe 1996's pixel/histogram comparisons); the decoded ``frame_key``
emitted by ``functions/media.sample_video_frames`` — the channel-0
pixel sum of the REAL GIF decode — is exactly such a statistic, so cut
detection composes relationally on top of the codec without touching
pixels twice.

Reference parity: the reference's media model decodes frames for
featurization (`02_Data Ingest.py:191-199`); scene cuts are the
standard reduction from "every frame" to "one frame per shot" that a
100 TB video corpus needs before feature extraction.

Scale shape: ONE keyed shuffle — the lag window partitions by video
id over narrow ``(id, frame_idx, key)`` rows; decoded pixel data
never leaves the decode stage, and output is only the cut rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["detect_scene_cuts"]


def detect_scene_cuts(
    frames: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "frame_idx",
    key_col: str = "frame_key",
    ts_col: str = "ts_sec",
    threshold: int = 150,
) -> DataFrame:
    """``(id, frame_idx, ts_sec, prev_key, frame_key, delta)`` — one
    row per detected cut: frames whose key differs from the previous
    frame's by at least ``threshold`` (absolute). The first frame of a
    video is never a cut (no predecessor)."""
    w = Window.partitionBy(id_col).orderBy(idx_col)
    prev = F.lag(key_col).over(w)
    delta = F.abs(F.col(key_col) - prev)
    return (
        frames.select(
            id_col,
            idx_col,
            ts_col,
            prev.alias("prev_key"),
            key_col,
            delta.alias("delta"),
        )
        .where(F.col("prev_key").isNotNull())
        .where(F.col("delta") >= threshold)
    )
