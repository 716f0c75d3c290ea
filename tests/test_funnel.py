"""Ordered-funnel state machine: strict order, strict timestamps,
repeats, and count/conversion semantics."""

import datetime as dt

from computer_vision_foundations_spark.operators.funnel import (
    funnel_counts,
    funnel_max_step,
)

STEPS = ["a", "b", "c"]


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp_ntz"
    )


def test_funnel_strict_order(spark):
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 1), (1, "c", 2),     # full funnel
        (2, "b", 0), (2, "a", 1), (2, "c", 2),     # b before a: stops at b? no - a@1 then c@2 -> step 2? c needs b AFTER a
        (3, "a", 0), (3, "c", 1),                  # skips b: step 1
        (4, "c", 0), (4, "b", 1),                  # never a: step 0
    ])
    got = {r.user: r.max_step for r in funnel_max_step(ev, STEPS).collect()}
    assert got[1] == 3
    # user 2: a@1, no b after 1 -> step 1
    assert got[2] == 1
    assert got[3] == 1
    assert got[4] == 0


def test_funnel_equal_timestamps_not_counted(spark):
    ev = _ev(spark, [(1, "a", 0), (1, "b", 0), (1, "c", 1)])
    got = {r.user: r.max_step for r in funnel_max_step(ev, STEPS).collect()}
    assert got[1] == 1  # b at the same instant as a does not advance


def test_funnel_retries_allowed(spark):
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 0),  # simultaneous b wasted
        (1, "b", 5), (1, "c", 6),
    ])
    got = {r.user: r.max_step for r in funnel_max_step(ev, STEPS).collect()}
    assert got[1] == 3  # later b@5 then c@6 completes


def test_funnel_counts_and_conversion(spark):
    ev = _ev(spark, [
        (1, "a", 0), (1, "b", 1), (1, "c", 2),
        (2, "a", 0), (2, "b", 1),
        (3, "a", 0),
        (4, "b", 0),  # no a: not counted anywhere
    ])
    rows = {r.step: r for r in funnel_counts(ev, STEPS).collect()}
    assert rows[1].n_users == 3 and rows[1].step_name == "a"
    assert rows[2].n_users == 2 and rows[3].n_users == 1
    assert rows[1].conversion == 1.0
    assert abs(rows[2].conversion - 2 / 3) < 1e-6


def test_kfold_deterministic_and_balancedish(spark):
    from computer_vision_foundations_spark.operators.split import (
        kfold_assignment,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.fold for r in kfold_assignment(df, "doc_id", k=5).collect()}
    b = {r.doc_id: r.fold for r in kfold_assignment(df, "doc_id", k=5).collect()}
    assert a == b
    sizes = [sum(1 for v in a.values() if v == f) for f in range(5)]
    assert all(120 <= s <= 280 for s in sizes)  # roughly uniform
    c = {r.doc_id: r.fold for r in kfold_assignment(df, "doc_id", k=5, seed=7).collect()}
    assert a != c


def test_edit_similarity_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        edit_similarity_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello w0rld"), (3, "something else")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {(r.id_a, r.id_b): r.edit_sim
           for r in edit_similarity_pairs(pairs, docs).collect()}
    assert out[(1, 2)] == round(1 - 1 / 11, 6)
    assert out[(1, 3)] < 0.4
    # threshold filters
    kept = edit_similarity_pairs(pairs, docs, threshold=0.8).collect()
    assert [(r.id_a, r.id_b) for r in kept] == [(1, 2)]


def test_event_transition_matrix(spark):
    import datetime

    from computer_vision_foundations_spark.operators.funnel import (
        event_transition_matrix,
    )

    base = datetime.datetime(2024, 1, 1)
    # user 1: a->b->a ; user 2: a->b
    rows = [
        (1, 1, base, "a"), (2, 1, base + datetime.timedelta(1), "b"),
        (3, 1, base + datetime.timedelta(2), "a"),
        (4, 2, base, "a"), (5, 2, base + datetime.timedelta(1), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r.from_type, r.to_type): r for r in event_transition_matrix(df).collect()}
    assert out[("a", "b")].n == 2 and out[("a", "b")].p_transition == 1.0
    assert out[("b", "a")].n == 1 and out[("b", "a")].p_transition == 1.0
    assert ("b", "b") not in out
    # no cross-user transition: user2's last 'b' has no successor
    assert sum(r.n for r in out.values()) == 3
