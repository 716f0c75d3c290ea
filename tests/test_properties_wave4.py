"""Property-based invariants (hypothesis) for the round-7 operators:
hash-pure Bernoulli sampling, histogram-sketch quantile brackets,
compaction-plan reconstruction, sessionization partitioning, and the
PII mask's idempotence. Same conventions as tests/test_properties.py —
one shared Spark session, small example counts, no deadlines."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_prop = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_prop
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    seed=st.integers(min_value=0, max_value=99),
)
def test_bernoulli_membership_is_pure_and_monotone(spark, ids, seed):
    """id_col membership is a pure function of (id, seed): repartition-
    invariant, and the kept set GROWS with the fraction (the threshold
    form's defining property — Spark's native sampler has neither)."""
    from computer_vision_foundations_spark.operators.split import (
        bernoulli_sample,
    )

    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    k10 = {
        r.id
        for r in bernoulli_sample(df, 0.1, seed=seed, id_col="id").collect()
    }
    k10_repart = {
        r.id
        for r in bernoulli_sample(
            df.repartition(7), 0.1, seed=seed, id_col="id"
        ).collect()
    }
    k50 = {
        r.id
        for r in bernoulli_sample(df, 0.5, seed=seed, id_col="id").collect()
    }
    assert k10 == k10_repart
    assert k10 <= k50


@_prop
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=2,
        max_size=80,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9]),
)
def test_histogram_quantile_bracket_contains_exact_quantile(spark, vals, q):
    """The sketch's [lo_edge, hi_edge] bracket must contain the exact
    ceil-rank order statistic — the sketch's entire error contract."""
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        histogram_quantiles,
    )
    import math

    df = spark.createDataFrame(
        [(float(v),) for v in vals], ["v"]
    )
    r = histogram_quantiles(df, "v", n_bins=16, qs=(q,)).collect()[0]
    exact = sorted(vals)[math.ceil(q * len(vals)) - 1]
    # rounding to 6 digits can shave <=5e-7 off each edge
    assert r.lo_edge - 1e-6 <= exact <= r.hi_edge + 1e-6


@_prop
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=40
    ),
    target=st.integers(min_value=10, max_value=1000),
)
def test_compaction_plan_reconstructs_listing(spark, sizes, target):
    """Groups partition the listing exactly: file count and byte mass
    are conserved, group ids are dense from 0, and each group after
    the first starts because the previous crossed its boundary."""
    from computer_vision_foundations_spark.operators.compaction import (
        compaction_plan,
    )

    rows = [(f"k{i:04d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["key", "bytes"])
    out = compaction_plan(df, "key", "bytes", target).collect()
    assert sum(r.n_files for r in out) == len(sizes)
    assert sum(r.group_bytes for r in out) == sum(sizes)
    gids = [r.group_id for r in out]
    assert gids == sorted(gids) and len(set(gids)) == len(gids)
    # contiguity of key ranges
    for a, b in zip(out, out[1:]):
        assert a.max_key < b.min_key


@_prop
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.integers(min_value=0, max_value=10_000),  # ts seconds
        ),
        min_size=1,
        max_size=50,
    ),
    gap=st.integers(min_value=1, max_value=600),
)
def test_sessionize_counts_partition_events(spark, events, gap):
    """Session stats partition each user's events exactly; duration of
    a session is <= (n_events-1) * gap by the gap rule."""
    import datetime

    from computer_vision_foundations_spark.operators.sessionize import (
        session_stats,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=ts), i, "t")
        for i, (u, ts) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "et"])
    out = session_stats(df, "u", "ts", "eid", "et", gap_seconds=gap).collect()
    per_user = {}
    for u, _ in events:
        per_user[u] = per_user.get(u, 0) + 1
    got = {}
    for r in out:
        got[r.user] = got.get(r.user, 0) + r.n_events
        assert r.duration_us <= (r.n_events - 1) * gap * 1_000_000
    assert got == per_user


@_prop
@given(
    text=st.text(
        alphabet=string.ascii_lowercase + " @.-0123456789",
        min_size=0,
        max_size=120,
    )
)
def test_pii_redaction_idempotent_and_nonexpanding_matches(spark, text):
    """Masking twice equals masking once, and a masked text contains
    no remaining email/phone/IP matches."""
    from computer_vision_foundations_spark.operators.pii import (
        pii_redact_col,
        pii_scan,
    )

    df = spark.createDataFrame([(1, text)], ["id", "txt"])
    once = df.select(pii_redact_col(F.col("txt")).alias("txt"), "id")
    twice = once.select(pii_redact_col(F.col("txt")).alias("txt"), "id")
    assert once.collect() == twice.collect()
    rescan = pii_scan(once, "txt", "id").collect()[0]
    assert (rescan.n_emails, rescan.n_phones, rescan.n_ipv4) == (0, 0, 0)
