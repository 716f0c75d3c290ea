"""Deterministic image augmentation over the dependency-free codecs.

The reference's training stage resizes/normalizes every image before
featurization (`03_Model Training.py` resize-to-model-input); a
training-data engine therefore needs augmentation as a FIRST-CLASS
batch op, not a torchvision afterthought: center crop, horizontal
flip, nearest-neighbor resize — the deterministic subset every
pipeline runs at ingest (random-crop/color-jitter belong train-side;
the deterministic ops belong data-side where they are cacheable).

All three transforms are pure integer index arithmetic over the REAL
decoded pixels (``functions/png.py``), and the result is re-encoded
as a REAL PNG — so a chain of encode→decode→augment→encode→decode→
statistics is replayable index-for-index by a SQL oracle on the
synthetic corpus, exactly like the codec chains (z21/z22/z32). A
crop-offset, flip-direction or resize-index bug hash-fails.

Conventions (match PIL/torchvision):
  * center crop offset = (size − out) // 2 on each axis
  * nearest-neighbor source index = (i · src) // dst  (floor)
  * hflip mirrors columns AFTER the crop, BEFORE the resize

Scale shape: one narrow Arrow projection — decode, numpy slicing,
re-encode, all inside the executor; augmented bytes are typically
smaller than inputs (crop+downsize), nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from computer_vision_foundations_spark.functions import png as _png

__all__ = [
    "center_crop",
    "hflip",
    "resize_nearest",
    "augment_png_udf",
]


def center_crop(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = px.shape[:2]
    if out_h > h or out_w > w:
        raise ValueError(f"crop {out_h}x{out_w} exceeds image {h}x{w}")
    top, left = (h - out_h) // 2, (w - out_w) // 2
    return px[top : top + out_h, left : left + out_w]


def hflip(px: np.ndarray) -> np.ndarray:
    return px[:, ::-1]


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = px.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return px[rows][:, cols]


def augment_png_udf(
    crop: tuple[int, int] | None = (8, 8),
    flip: bool = True,
    size: tuple[int, int] | None = (4, 4),
):
    """Arrow-batched ``binary → binary``: decode PNG → center crop →
    horizontal flip → nearest resize → re-encode PNG. Pass ``None``
    to skip a stage. Grayscale and RGB alike (index ops are
    channel-agnostic)."""

    @F.pandas_udf(T.BinaryType())
    def f(contents: pd.Series) -> pd.Series:
        out = []
        for b in contents:
            px = _png.decode_png(bytes(b))["pixels"]
            if crop is not None:
                px = center_crop(px, *crop)
            if flip:
                px = hflip(px)
            if size is not None:
                px = resize_nearest(px, *size)
            arr = px[:, :, 0] if px.shape[2] == 1 else px
            out.append(_png.encode_png(np.ascontiguousarray(arr)))
        return pd.Series(out)

    return f
