"""Range-join operators, checked against a brute-force cross join on
small frames and for plan shape (bucketized path must be a hash/merge
join, never BroadcastNestedLoopJoin/Cartesian)."""

import datetime as dt
import random

from computer_vision_foundations_spark.operators.ranges import (
    interval_overlap_join,
    range_join,
)

BASE = dt.datetime(2024, 1, 1)


def _points(spark, n=80, span=5000, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(3), BASE + dt.timedelta(seconds=rng.randrange(span)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, ["pid", "k", "ts"])


def _intervals(spark, n=30, span=5000, max_len=400, seed=4):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randrange(span)
        rows.append(
            (
                i + 100,
                rng.randrange(3),
                BASE + dt.timedelta(seconds=s),
                BASE + dt.timedelta(seconds=s + rng.randrange(max_len)),
            )
        )
    return rows, spark.createDataFrame(rows, ["iid", "k", "start", "end"])


def _expected_pairs(points, intervals, keyed):
    return {
        (p[0], iv[0])
        for p in points
        for iv in intervals
        if iv[2] <= p[2] <= iv[3] and (not keyed or p[1] == iv[1])
    }


def test_bucketized_matches_bruteforce(spark):
    points, pdf = _points(spark)
    intervals, idf = _intervals(spark)
    got = {
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf, "ts", "start", "end", bucket_width=300
        ).collect()
    }
    assert got == _expected_pairs(points, intervals, keyed=False)


def test_keyed_matches_bruteforce(spark):
    points, pdf = _points(spark)
    intervals, idf = _intervals(spark)
    got = {
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "ts", "start", "end", on="k").collect()
    }
    assert got == _expected_pairs(points, intervals, keyed=True)


def test_bucketized_plan_is_hash_join(spark):
    _, pdf = _points(spark)
    _, idf = _intervals(spark)
    plan = (
        range_join(pdf, idf, "ts", "start", "end", bucket_width=300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_inclusive_bounds(spark):
    pdf = spark.createDataFrame([(1, BASE), (2, BASE + dt.timedelta(seconds=10))], ["pid", "ts"])
    idf = spark.createDataFrame([(9, BASE, BASE + dt.timedelta(seconds=10))], ["iid", "start", "end"])
    got = {(r.pid, r.iid) for r in range_join(pdf, idf, "ts", "start", "end", bucket_width=7).collect()}
    assert got == {(1, 9), (2, 9)}


def test_overlap_join_matches_bruteforce(spark):
    a_rows, adf = _intervals(spark, n=25, seed=5)
    b_rows, bdf = _intervals(spark, n=25, seed=6)
    bdf = (
        bdf.withColumnRenamed("iid", "jid")
        .withColumnRenamed("start", "bstart")
        .withColumnRenamed("end", "bend")
    )
    got = {
        (r.iid, r.jid)
        for r in interval_overlap_join(
            adf, bdf, "start", "end", "bstart", "bend", bucket_width=250
        ).collect()
    }
    exp = {
        (a[0], b[0] )
        for a in a_rows
        for b in b_rows
        if a[2] <= b[3] and b[2] <= a[3]
    }
    assert got == exp


def test_overlap_join_no_duplicate_pairs(spark):
    # long intervals covering many buckets must still yield each pair once
    adf = spark.createDataFrame(
        [(1, BASE, BASE + dt.timedelta(seconds=4000))], ["iid", "start", "end"]
    )
    bdf = spark.createDataFrame(
        [(2, BASE + dt.timedelta(seconds=100), BASE + dt.timedelta(seconds=3900), 0)],
        ["jid", "bstart", "bend", "pad"],
    )
    out = interval_overlap_join(
        adf, bdf, "start", "end", "bstart", "bend", bucket_width=100
    ).collect()
    assert len(out) == 1


def test_bucketized_timestamp_ntz(spark):
    # parquet fixtures surface as TIMESTAMP_NTZ; the bucket math must
    # accept both timestamp flavors (unix_micros only takes TIMESTAMP)
    points, pdf = _points(spark)
    intervals, idf = _intervals(spark)
    pdf = pdf.withColumn("ts", pdf["ts"].cast("timestamp_ntz"))
    idf = idf.withColumn("start", idf["start"].cast("timestamp_ntz")).withColumn(
        "end", idf["end"].cast("timestamp_ntz")
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf, "ts", "start", "end", bucket_width=300
        ).collect()
    }
    assert got == _expected_pairs(points, intervals, keyed=False)


def test_ntz_bucketing_survives_dst_gap(spark):
    """NTZ bucket math must be zone-free: under a DST session zone, a
    session-zone cast maps NTZ 02:30 to a LATER instant than NTZ 03:00
    across the 2021-03-14 America/Los_Angeles spring-forward gap, so a
    genuinely matching pair lands in a bucket the interval never
    explodes into (ADVICE r2). Field-arithmetic micros are monotone in
    the NTZ value regardless of the session zone."""
    import datetime as dt

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        point = dt.datetime(2021, 3, 14, 3, 0, 0)
        lo = dt.datetime(2021, 3, 14, 2, 30, 0)
        hi = dt.datetime(2021, 3, 14, 3, 30, 0)
        pdf = spark.createDataFrame([(1, point)], "pid int, ts timestamp_ntz")
        idf = spark.createDataFrame(
            [(7, lo, hi)], "iid int, start timestamp_ntz, end timestamp_ntz"
        )
        got = {
            (r.pid, r.iid)
            for r in range_join(
                pdf, idf, "ts", "start", "end", bucket_width=900
            ).collect()
        }
        assert got == {(1, 7)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
