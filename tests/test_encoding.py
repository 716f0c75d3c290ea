"""OOF target encoding and WoE/IV: leakage and closed-form checks."""

import math

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.encoding import (
    oof_target_encoding,
    woe_iv,
)


def test_oof_excludes_own_fold(spark):
    # category 'a' targets: fold assignment is hash-based, so instead
    # of pinning folds we check the defining invariant directly:
    # for every (cat, fold) row, encoding == smoothed mean of the
    # OTHER folds' rows, recomputed from first principles.
    rows = [("a", i, float(i)) for i in range(40)] + [
        ("b", 100 + i, 50.0 + i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["cat", "id", "t"])
    out = oof_target_encoding(df, "cat", "t", "id", k=4, smoothing=2.0, seed=3)
    got = {(r.category, r.fold): (r.n_oof, r.encoding) for r in out.collect()}

    from computer_vision_foundations_spark.operators.conformal import (
        split_unit,
    )

    assigned = df.select(
        "cat",
        "t",
        F.floor(split_unit(3, F.col("id")) * 4).cast("int").alias("fold"),
    ).collect()
    prior = sum(round(r.t * 1e6) for r in assigned) / len(assigned) / 1e6
    for (cat, fold), (n_oof, enc) in got.items():
        oof = [r for r in assigned if r.cat == cat and r.fold != fold]
        assert n_oof == len(oof)
        expect = (
            sum(round(r.t * 1e6) for r in oof) / 1e6 + 2.0 * prior
        ) / (len(oof) + 2.0)
        assert abs(enc - expect) < 1e-6, (cat, fold)


def test_woe_signs_and_iv(spark):
    # bin 0: good-heavy, bin 1: bad-heavy → woe positive then negative
    rows = [(0, 0)] * 90 + [(0, 1)] * 10 + [(1, 0)] * 10 + [(1, 1)] * 90
    df = spark.createDataFrame(rows, ["b", "y"])
    out = {r.bin: r for r in woe_iv(df, F.col("b"), F.col("y") == 1).collect()}
    assert out[0].woe > 0 > out[1].woe
    assert out[0].iv == out[1].iv > 0
    # closed form for bin 0 with 0.5 smoothing
    g, b, gt, bt = 90, 10, 100, 100
    expect = math.log(((g + 0.5) / gt) / ((b + 0.5) / bt))
    assert abs(out[0].woe - round(expect, 6)) < 1e-9


def test_woe_iv_handles_empty_class_bin(spark):
    # a bin with zero bad rows must stay finite via smoothing
    rows = [(0, 0)] * 50 + [(1, 0)] * 10 + [(1, 1)] * 40
    df = spark.createDataFrame(rows, ["b", "y"])
    out = woe_iv(df, F.col("b"), F.col("y") == 1).collect()
    assert all(math.isfinite(r.woe) and math.isfinite(r.iv) for r in out)
