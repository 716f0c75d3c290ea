"""Bloom runtime-filter join pruning (operators/runtime_filter.py):
identity with the plain join, actual row pruning, and the
no-outer-join guard."""

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.runtime_filter import (
    bloom_prefiltered_join,
    bloom_runtime_filter,
)


def _tables(spark):
    big = spark.range(0, 20_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 20).select((F.col("id") * 3).alias("k"))
    return big, small


def test_prefiltered_join_equals_plain_join(spark):
    big, small = _tables(spark)
    got = sorted(
        map(tuple, bloom_prefiltered_join(big, small, "k").collect())
    )
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(want) > 0


def test_runtime_filter_prunes_and_admits_no_false_negatives(spark):
    big, small = _tables(spark)
    kept = bloom_runtime_filter(big, small.select("k"), "k")
    n_kept = kept.count()
    n_true = big.join(small.select("k").distinct(), "k", "left_semi").count()
    # every true match survives; pruning is real (most of the 500 keys
    # do not match the 20 build keys, so the scan drops the bulk)
    assert n_true <= n_kept < big.count() * 0.25


def test_outer_join_flavors_rejected(spark):
    big, small = _tables(spark)
    with pytest.raises(ValueError, match="outer"):
        bloom_prefiltered_join(big, small, "k", how="left")


def test_null_and_empty_sides(spark):
    big = spark.createDataFrame(
        [(None, 1), (2, 2)], "k int, v int"
    )
    small = spark.createDataFrame([(2,)], "k int")
    got = sorted(
        map(tuple, bloom_prefiltered_join(big, small, "k").collect())
    )
    assert got == [(2, 2)]
    # empty build side -> empty result, no crash
    empty = spark.createDataFrame([], "k int")
    assert bloom_prefiltered_join(big, empty, "k").count() == 0


def test_string_keys(spark):
    """Non-numeric keys hash through the same string cast on both
    sides — membership stays false-negative-free."""
    big = spark.createDataFrame(
        [(f"k{i % 40}", i) for i in range(2000)], "k string, v long"
    )
    small = spark.createDataFrame([("k3",), ("k17",)], "k string")
    got = sorted(
        map(tuple, bloom_prefiltered_join(big, small, "k").collect())
    )
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(want) == 100
