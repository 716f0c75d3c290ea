"""Known-answer checks for relational helpers & windows (SURVEY §2.2-2.7).

The full relational surface is differential-tested against DuckDB by
tools/oracle_check.py / the driver; these unit tests cover the pieces
with engine-internal semantics (sessionization boundaries, tumbling
windows) on tiny crafted frames.
"""

import datetime

from pyspark.sql import functions as F

from computer_vision_foundations_spark.streaming.windows import (
    sessionized,
    streaming_session_counts,
    tumbling_counts,
)


def _events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", base, 1.0),
        ("u1", base + datetime.timedelta(minutes=10), 2.0),
        ("u1", base + datetime.timedelta(minutes=50), 3.0),  # gap 40m > 30m
        ("u2", base + datetime.timedelta(hours=2), 4.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_sessionized_gap_boundaries(spark):
    out = sessionized(_events(spark), gap_seconds=1800)
    sess = {(r.user_id, r.ts.minute + 60 * r.ts.hour): r.session_id for r in out.collect()}
    assert sess[("u1", 0)] == 1
    assert sess[("u1", 10)] == 1  # 10m gap: same session
    assert sess[("u1", 50)] == 2  # 40m gap: new session
    assert sess[("u2", 120)] == 1  # per-user numbering


def test_tumbling_counts_batch(spark):
    out = tumbling_counts(
        _events(spark), ts_col="ts", duration="1 hour", group_cols=("user_id",)
    ).collect()
    got = {(r.user_id, r.window_start.hour): (r.n_events, r.sum_value) for r in out}
    assert got == {("u1", 0): (3, 6.0), ("u2", 2): (1, 4.0)}


def test_streaming_session_counts_batch_mode(spark):
    out = streaming_session_counts(_events(spark), gap="30 minutes").collect()
    got = {(r.user_id, r.session_start.minute): r.n_events for r in out}
    # u1: [00:00,00:10] one session (2 events), [00:50] second session
    assert got == {("u1", 0): 2, ("u1", 50): 1, ("u2", 0): 1}
