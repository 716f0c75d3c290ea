import numpy as np
import pytest

from computer_vision_foundations_spark.functions.augment import (
    center_crop,
    hflip,
    resize_nearest,
)
from computer_vision_foundations_spark.functions.png import (
    decode_png,
    encode_png,
)


def _grid(h, w):
    return np.arange(h * w, dtype=np.uint8).reshape(h, w, 1)


def test_center_crop_offsets():
    px = _grid(6, 8)
    out = center_crop(px, 4, 4)
    # top = (6-4)//2 = 1, left = (8-4)//2 = 2
    assert out.shape == (4, 4, 1)
    assert out[0, 0, 0] == 1 * 8 + 2


def test_center_crop_rejects_upscale():
    with pytest.raises(ValueError):
        center_crop(_grid(4, 4), 5, 4)


def test_hflip_mirrors_columns():
    px = _grid(2, 3)
    out = hflip(px)
    assert out[0, :, 0].tolist() == [2, 1, 0]
    assert out[1, :, 0].tolist() == [5, 4, 3]


def test_resize_nearest_floor_indices():
    px = _grid(8, 8)
    out = resize_nearest(px, 4, 4)
    # src index = (i*8)//4 = 2i
    assert out[:, :, 0].tolist() == [
        [(2 * r) * 8 + 2 * c for c in range(4)] for r in range(4)
    ]


def test_resize_nearest_upscale():
    px = _grid(2, 2)
    out = resize_nearest(px, 4, 4)
    # src index = (i*2)//4 = i//2 -> each pixel repeats 2x2
    assert out[:, :, 0].tolist() == [
        [0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3],
    ]


def test_full_chain_round_trips_through_png(spark):
    from pyspark.sql import functions as F

    from computer_vision_foundations_spark.functions.augment import (
        augment_png_udf,
    )

    src = np.arange(72, dtype=np.uint8).reshape(8, 9)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(src)))], "id long, content binary"
    )
    out = df.select(
        augment_png_udf((8, 8), True, (4, 4))(F.col("content")).alias("a")
    ).collect()
    px = decode_png(bytes(out[0]["a"]))["pixels"][:, :, 0]
    want = [[src[2 * r, 7 - 2 * c] for c in range(4)] for r in range(4)]
    assert px.tolist() == want
