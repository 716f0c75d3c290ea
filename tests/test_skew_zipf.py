"""Join-skew preflight and Zipf-fit unit tests."""

import math

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.skewstats import (
    join_skew_stats,
)
from computer_vision_foundations_spark.operators.zipf import zipf_fit


def test_join_skew_exact_output_size(spark):
    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], ["k"]
    )
    right = spark.createDataFrame([("a",)] * 4 + [("b",)], ["k"])
    r = join_skew_stats(left, right, "k", "k", top_k=1).collect()[0]
    # 'c' has no right match: keys = {a, b}; out = 3*4 + 2*1 = 14
    assert (r.n_keys, r.out_rows, r.max_key_rows) == (2, 14, 12)
    assert r.top_share == round(12 / 14, 6)
    # cross-check against the actual join
    assert left.join(right, "k").count() == r.out_rows


def test_join_skew_uniform_has_low_top_share(spark):
    left = spark.createDataFrame([(i % 10,) for i in range(100)], ["k"])
    r = join_skew_stats(left, left, "k", "k", top_k=1).collect()[0]
    assert r.n_keys == 10
    assert r.top_share == round(1 / 10, 6)


def test_zipf_fit_recovers_exact_power_law(spark):
    # freq(rank) = 2^20 // rank**1 is not exact after int floor, so
    # build y = C * r^-2 exactly representable: counts = (N/r)^2 won't
    # be integers either. Instead synthesize tokens whose counts are
    # round(C * r^-1) and assert slope ~ -1 within tolerance.
    rows = []
    C = 1024
    for r in range(1, 33):
        tok = f"t{r:03d}"
        rows += [(tok,)] * max(1, round(C / r))
    df = spark.createDataFrame([(" ".join(t for (t,) in rows),)], ["text"])
    out = zipf_fit(df, "text", n_ranks=32).collect()[0]
    assert out.n_ranks == 32
    assert abs(out.slope + 1.0) < 0.05
    assert out.r2 > 0.999


def test_zipf_rank_ties_broken_by_token(spark):
    # equal counts: rank order must be by token asc -> deterministic fit
    df = spark.createDataFrame([("b a c b a c",)], ["text"])
    a = zipf_fit(df, "text", n_ranks=3).collect()
    b = zipf_fit(df, "text", n_ranks=3).collect()
    assert a == b
    assert math.isnan(a[0].slope) or a[0].slope == 0.0  # flat counts


def test_negative_sampling_pure_and_collision_free(spark):
    from computer_vision_foundations_spark.operators.negatives import (
        negative_samples,
    )

    corpus = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (5, 6), (50, 51)], ["anchor", "pos"]
    )
    out = negative_samples(
        pairs, corpus, "anchor", "pos", "doc_id", k=8, seed=7
    )
    rows = out.collect()
    # negatives never equal their pair's anchor/positive, stay in range
    for r in rows:
        assert r.neg not in (r.anchor, r.pos)
        assert 0 <= r.neg < 100
    # at most k per pair (collisions dropped, not redrawn)
    from collections import Counter

    per_pair = Counter((r.anchor, r.pos) for r in rows)
    assert all(v <= 8 for v in per_pair.values())
    # purity: identical under repartitioning and reruns
    again = negative_samples(
        pairs.repartition(5), corpus, "anchor", "pos", "doc_id", k=8, seed=7
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # different seed -> different draws (overwhelmingly)
    other = negative_samples(
        pairs, corpus, "anchor", "pos", "doc_id", k=8, seed=8
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_event_disorder_ordered_feed_is_clean(spark):
    import datetime

    from computer_vision_foundations_spark.operators.disorder import (
        event_disorder_stats,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=i), i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "arr"])
    r = event_disorder_stats(df, "u", "ts", "arr", qs=(0.5,)).collect()[0]
    assert (r.n_events, r.n_late, r.frac_late) == (20, 0, 0.0)
    assert r.p50_late_us is None and r.max_late_us is None


def test_event_disorder_measures_known_lateness(spark):
    import datetime

    from computer_vision_foundations_spark.operators.disorder import (
        event_disorder_stats,
    )

    base = datetime.datetime(2024, 1, 1)
    # arrival order: t=0, t=10, then a straggler with t=3 (7s late)
    rows = [
        (1, base, 0),
        (1, base + datetime.timedelta(seconds=10), 1),
        (1, base + datetime.timedelta(seconds=3), 2),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "arr"])
    r = event_disorder_stats(df, "u", "ts", "arr", qs=(0.5,)).collect()[0]
    assert (r.n_events, r.n_late) == (3, 1)
    assert r.p50_late_us == 7_000_000 == r.max_late_us
