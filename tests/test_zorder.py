"""Z-order key properties: round-trip, locality, and layout pruning."""

import os

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.zorder import (
    layout_by_zorder,
    zorder_key,
)


def test_key_is_exact_morton_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)], ["x", "y"]
    )
    rows = df.select(
        "x", "y", zorder_key(["x", "y"], bits=8).alias("z")
    ).collect()
    for r in rows:
        x = sum(((r.z >> (2 * b)) & 1) << b for b in range(8))
        y = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(8))
        assert (x, y) == (r.x, r.y)


def test_zorder_files_are_compact_in_both_dims(spark, tmp_path):
    # 64x64 grid laid out into 16 files: each file's x/y spans must be
    # far smaller than a 1-D sort would give (a row-major sort covers
    # the FULL y range in every file)
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    p = os.path.join(str(tmp_path), "z")
    layout_by_zorder(df, ["x", "y"], bits=6, n_files=16).write.parquet(p)
    spans = (
        spark.read.parquet(p)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(spans) >= 8
    # every file's bounding box stays well under the full 63 span in
    # BOTH dimensions (z-curve guarantee); row-major would have dy=63
    assert all(r.dx <= 32 and r.dy <= 32 for r in spans), spans


def test_bits_overflow_guard(spark):
    import pytest

    with pytest.raises(ValueError, match="<= 62"):
        zorder_key(["a", "b", "c"], bits=21)
