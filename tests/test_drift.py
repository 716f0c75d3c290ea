"""Volume-drift detection (operators/drift.py): baseline exclusion,
anomaly thresholding, cold-start NULLs, constant-history jumps."""

import datetime

from computer_vision_foundations_spark.operators.drift import volume_drift


def _events(spark, day_counts, category="click"):
    """day_counts: {day_offset: n_events} -> one row per event."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for off, n in day_counts.items():
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(days=off), category))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def test_spike_is_flagged_and_baseline_excludes_self(spark):
    counts = {i: 10 for i in range(8)}
    counts[8] = 100  # spike after a stable week
    df = _events(spark, counts)
    out = {r.day.isoformat(): r for r in volume_drift(df).collect()}
    spike = out["2024-01-09"]
    # stable history has sd 0 -> z NULL but constant_jump fires
    assert spike.z is None and spike.constant_jump
    assert spike.trail_mean == 10.0  # the 100 did not pollute its baseline


def test_zscore_value_matches_hand_computation(spark):
    import statistics

    counts = {0: 8, 1: 12, 2: 10, 3: 30}
    df = _events(spark, counts)
    out = {r.day.isoformat(): r for r in volume_drift(df).collect()}
    hist = [8, 12, 10]
    expect = (30 - statistics.mean(hist)) / statistics.stdev(hist)
    got = out["2024-01-04"]
    assert abs(got.z - round(expect, 6)) < 1e-9
    assert got.is_anomaly == (abs(expect) > 3.0)


def test_cold_start_days_have_null_z(spark):
    df = _events(spark, {0: 5, 1: 6})
    out = sorted(volume_drift(df).collect(), key=lambda r: r.day)
    assert out[0].z is None and out[1].z is None  # <2 prior days
    assert not out[0].is_anomaly


def test_categories_independent(spark):
    a = _events(spark, {i: 10 for i in range(5)}, category="a")
    b = _events(spark, {i: 1000 for i in range(5)}, category="b")
    df = a.unionByName(b)
    out = volume_drift(df).collect()
    assert not any(r.is_anomaly for r in out)  # each stable in own scale


def test_snapshot_diff_statuses(spark):
    from computer_vision_foundations_spark.operators.diff import (
        snapshot_diff,
        snapshot_diff_counts,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    st = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert st == {1: "unchanged", 2: "modified", 3: "removed", 4: "added"}
    counts = {r.status: r.n for r in snapshot_diff_counts(old, new).collect()}
    assert counts == {"unchanged": 1, "modified": 1, "removed": 1, "added": 1}


def test_calendar_gap_does_not_stretch_baseline(spark):
    # days 0-6 at 10/day, 3-day gap, then day 10 at 50: the trailing
    # 7-day RANGE window sees only days 3-6 (not days 0-6), so the
    # baseline stays calendar-true across the gap
    counts = {i: 10 for i in range(7)}
    counts[10] = 50
    df = _events(spark, counts)
    out = {r.day.isoformat(): r for r in volume_drift(df).collect()}
    spike = out["2024-01-11"]
    assert spike.trail_mean == 10.0
    # only 4 prior days (3..6) are in range; constant history -> jump flag
    assert spike.constant_jump


def test_snapshot_diff_null_text_is_modified_not_added(spark):
    from computer_vision_foundations_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "now set"), (2, None)], "doc_id long, text string")
    st = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert st[1] == "modified"  # NULL -> value is a content change
    assert st[2] == "unchanged"  # NULL == NULL under null-safe compare
