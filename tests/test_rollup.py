"""Hierarchical time rollup: coarse levels must equal direct
aggregation of the raw data (partial-merge losslessness)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.rollup import time_rollup

BASE = dt.datetime(2024, 1, 1)


def _events(spark, n=500, seed=9):
    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randrange(2),
            BASE + dt.timedelta(minutes=rng.randrange(60 * 24 * 70)),
            rng.random() * 100,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["eid", "k", "ts", "v"])


def test_levels_match_direct_aggregation(spark):
    df = _events(spark)
    out = time_rollup(
        df,
        "ts",
        aggs={
            "n": ("eid", "count"),
            "s": ("v", "sum"),
            "mn": ("v", "min"),
            "mx": ("v", "max"),
        },
    )
    for g in ("hour", "day", "month"):
        got = {
            r.bucket: (r.n, round(r.s, 6), round(r.mn, 6), round(r.mx, 6))
            for r in out.filter(F.col("granularity") == g).collect()
        }
        direct = {
            r.bucket: (r.n, round(r.s, 6), round(r.mn, 6), round(r.mx, 6))
            for r in df.groupBy(F.date_trunc(g, "ts").alias("bucket"))
            .agg(
                F.count("eid").alias("n"),
                F.sum("v").alias("s"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        }
        assert got == direct, g


def test_keys_preserved_at_every_level(spark):
    df = _events(spark)
    out = time_rollup(
        df, "ts", aggs={"n": ("eid", "count")}, keys=["k"]
    )
    month_total = (
        out.filter("granularity = 'month'").agg(F.sum("n")).collect()[0][0]
    )
    assert month_total == df.count()
    assert set(out.columns) == {"granularity", "bucket", "k", "n"}


def test_unsupported_agg_raises(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="unsupported agg"):
        time_rollup(df, "ts", aggs={"a": ("v", "avg")})
