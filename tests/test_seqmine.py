"""Sequential pattern mining: agreement with a pure-Python miner,
support threshold, and timeline-boundary behavior."""

import datetime as dt

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.seqmine import (
    consecutive_patterns,
)


def _py_patterns(timelines, lengths=(2, 3), min_users=2):
    occ, users = {}, {}
    for u, seq in timelines.items():
        for n in lengths:
            for i in range(len(seq) - n + 1):
                p = (n, ">".join(seq[i : i + n]))
                occ[p] = occ.get(p, 0) + 1
                users.setdefault(p, set()).add(u)
    return {
        p: (occ[p], len(users[p]))
        for p in occ
        if len(users[p]) >= min_users
    }


TIMELINES = {
    1: ["view", "click", "purchase", "view", "click"],
    2: ["view", "click", "purchase"],
    3: ["view", "click", "click"],
    4: ["signup"],  # too short for any pattern
}


def _df(spark):
    rows = []
    for u, seq in TIMELINES.items():
        for i, e in enumerate(seq):
            rows.append(
                Row(
                    user_id=u,
                    event_id=u * 100 + i,
                    ts=dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i),
                    event_type=e,
                )
            )
    return spark.createDataFrame(rows)


def test_patterns_match_python(spark):
    got = {
        (r["n"], r["pattern"]): (r["n_occurrences"], r["n_users"])
        for r in consecutive_patterns(_df(spark)).collect()
    }
    assert got == _py_patterns(TIMELINES)
    assert got[(2, "view>click")] == (4, 3)  # user 1 has it twice
    assert (3, "view>click>purchase") in got


def test_min_users_filters_singletons(spark):
    got = consecutive_patterns(_df(spark), min_users=2).collect()
    # click>click happens only for user 3 -> filtered
    assert all(r["pattern"] != "click>click" for r in got)
    got_all = consecutive_patterns(_df(spark), min_users=1).collect()
    assert any(r["pattern"] == "click>click" for r in got_all)


def test_patterns_do_not_cross_users(spark):
    # user 4's lone 'signup' must never pair with another user's events
    got = consecutive_patterns(_df(spark), min_users=1).collect()
    assert all("signup" not in r["pattern"] for r in got)
