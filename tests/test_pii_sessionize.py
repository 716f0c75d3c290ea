"""PII scan/redaction and batch sessionization unit tests."""

import datetime

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.pii import (
    pii_redact_col,
    pii_scan,
)
from computer_vision_foundations_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def test_pii_counts_and_masks(spark):
    rows = [
        (1, "mail a.b@x.io or c@y.co.uk tel 25-989-741-2988 ip 10.2.3.4"),
        (2, "nothing sensitive here"),
        (3, "two mails p@q.org r@s.net"),
    ]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = {r["id"]: r for r in pii_scan(df, "txt", "id").collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ipv4) == (2, 1, 1)
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ipv4) == (0, 0, 0)
    assert out[3].n_emails == 2
    red = (
        df.filter("id = 1")
        .select(pii_redact_col(F.col("txt")).alias("r"))
        .collect()[0]["r"]
    )
    assert red == "mail [EMAIL] or [EMAIL] tel [PHONE] ip [IP]"


def test_pii_redaction_is_idempotent(spark):
    # placeholders contain no digits/'@' so a second pass is a no-op
    df = spark.createDataFrame([(1, "a@b.co at 1.2.3.4")], ["id", "txt"])
    once = df.select(pii_redact_col(F.col("txt")).alias("r"))
    twice = once.select(pii_redact_col(F.col("r")).alias("r"))
    assert once.collect() == twice.collect()


def _ts(minute, second=0, micro=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second, micro)


def test_sessionize_gap_boundary(spark):
    # gap=60s: exactly 60s stays in-session, 60.000001s breaks
    rows = [
        (7, _ts(0), 1, "a"),
        (7, _ts(1), 2, "a"),          # +60s  -> same session
        (7, _ts(2, 0, 1), 3, "b"),    # +60.000001s -> new session
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "et"])
    out = sessionize(df, "u", "ts", "eid", gap_seconds=60).orderBy("eid")
    assert [r.session_idx for r in out.collect()] == [1, 1, 2]


def test_sessionize_ts_tie_broken_by_id(spark):
    rows = [(1, _ts(0), 5, "a"), (1, _ts(0), 4, "a"), (1, _ts(5), 6, "b")]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "et"])
    out = session_stats(df, "u", "ts", "eid", "et", gap_seconds=60).collect()
    # one session of 2 (ids 4,5 at the same ts), one singleton
    assert [(r.session_idx, r.n_events) for r in out] == [(1, 2), (2, 1)]
    assert out[0].duration_us == 0


def test_session_stats_duration_exact_micros(spark):
    rows = [(2, _ts(0, 0, 250), 1, "a"), (2, _ts(0, 30, 750), 2, "b")]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "et"])
    r = session_stats(df, "u", "ts", "eid", "et", gap_seconds=60).collect()[0]
    assert r.duration_us == 30 * 1_000_000 + 500
    assert r.n_types == 2
