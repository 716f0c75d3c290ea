"""Contract tests for the shared query-harness helpers in
queries/common.py (the streaming-differential chunkers every
stream≡batch oracle replays through)."""

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.queries.common import ts_chunks


def _ev(spark):
    return spark.createDataFrame(
        [(i, f"2024-01-{d:02d} 00:00:00") for i, d in enumerate([1, 5, 9, 20])],
        "id long, s string",
    ).select("id", F.col("s").cast("timestamp").alias("ts"))


def test_ts_chunks_partitions_every_row_exactly_once(spark):
    df = _ev(spark)
    chunks = ts_chunks(df, ["2024-01-04", "2024-01-10"])
    sizes = [c.count() for c in chunks]
    assert sizes == [1, 2, 1]
    assert sum(sizes) == df.count()


def test_ts_chunks_empty_cuts_is_single_full_chunk(spark):
    df = _ev(spark)
    chunks = ts_chunks(df, [])
    assert len(chunks) == 1
    assert chunks[0].count() == df.count()


def test_ts_chunks_rejects_unsorted_cuts(spark):
    df = _ev(spark)
    with pytest.raises(ValueError, match="ascending"):
        ts_chunks(df, ["2024-01-10", "2024-01-04"])
