"""Feature hashing audit and histogram-quantile sketch unit tests."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.feature_hash import (
    hashed_feature_audit,
)
from computer_vision_foundations_spark.operators.quantile_sketch import (
    histogram_quantiles,
)


def test_feature_hash_conserves_mass(spark):
    df = spark.createDataFrame(
        [(1, "a b b c"), (2, "a d")], ["doc_id", "text"]
    )
    out = hashed_feature_audit(df, "text", "doc_id", dim=16, seed=5)
    rows = out.collect()
    # total occurrences preserved: 6 tokens; 4 distinct tokens
    assert sum(r.n_occurrences for r in rows) == 6
    assert sum(r.n_tokens for r in rows) == 4
    # |signed_sum| can never exceed the occurrence mass of its index
    assert all(abs(r.signed_sum) <= r.n_occurrences for r in rows)
    assert all(0 <= r.feat < 16 for r in rows)


def test_feature_hash_is_stateless_and_seeded(spark):
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    a = hashed_feature_audit(df, "text", "doc_id", dim=64, seed=5).collect()
    b = hashed_feature_audit(df, "text", "doc_id", dim=64, seed=5).collect()
    c = hashed_feature_audit(df, "text", "doc_id", dim=64, seed=6).collect()
    assert a == b
    assert {r.feat for r in a} != {r.feat for r in c} or a != c


def test_histogram_quantiles_bracket_truth(spark):
    # 1..1000 uniform: p50 bracket must contain 500, p99 contain 990
    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    out = {
        r.q: r
        for r in histogram_quantiles(
            df, "v", n_bins=128, qs=(0.5, 0.99)
        ).collect()
    }
    assert out[0.5].lo_edge <= 500 <= out[0.5].hi_edge
    assert out[0.99].lo_edge <= 990 <= out[0.99].hi_edge
    assert out[0.5].n == 1000
    # bracket width == (max-min)/n_bins
    w = (1000.0 - 1.0) / 128
    assert abs((out[0.5].hi_edge - out[0.5].lo_edge) - w) < 1e-6


def test_histogram_quantiles_constant_column(spark):
    df = spark.range(10).select(F.lit(42.0).alias("v"))
    r = histogram_quantiles(df, "v", n_bins=64, qs=(0.9,)).collect()[0]
    assert (r.bin, r.est, r.lo_edge, r.hi_edge) == (0, 42.0, 42.0, 42.0)
