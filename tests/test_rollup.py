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


def test_gap_fill_locf(spark):
    import datetime as dt

    from computer_vision_foundations_spark.operators.rollup import (
        gap_fill_locf,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(days=3), 40.0),   # days 1,2 are gaps
        (2, base + dt.timedelta(days=1), 5.0),    # single observation
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = gap_fill_locf(df, "ts", "user_id", "value", 86_400)
    got = {(r.key, r.bucket_ts.day): (r.value, r.filled) for r in out.collect()}
    assert got[(1, 1)] == (10.0, False)
    assert got[(1, 2)] == (10.0, True)   # carried forward
    assert got[(1, 3)] == (10.0, True)
    assert got[(1, 4)] == (40.0, False)
    assert got[(2, 2)] == (5.0, False)
    assert len([k for k in got if k[0] == 2]) == 1  # span is per key


def test_gap_fill_aggregates_within_bucket(spark):
    import datetime as dt

    from computer_vision_foundations_spark.operators.rollup import (
        gap_fill_locf,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 10.0), (1, base + dt.timedelta(hours=2), 30.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = gap_fill_locf(df, "ts", "user_id", "value", 86_400).collect()
    assert len(out) == 1 and out[0].value == 20.0  # avg within the day
