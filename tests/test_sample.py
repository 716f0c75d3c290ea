"""Deterministic hash samplers: exact size, consistency (smaller k is
a subset of larger k), per-group caps, and seed sensitivity."""

from computer_vision_foundations_spark.operators.sample import (
    bottom_k_sample,
    group_cap_sample,
)


def _docs(spark, n=200, groups=4):
    rows = [(i, f"g{i % groups}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_bottom_k_exact_size_and_determinism(spark):
    df = _docs(spark)
    a = sorted(r.doc_id for r in bottom_k_sample(df, "doc_id", 50).collect())
    b = sorted(r.doc_id for r in bottom_k_sample(df, "doc_id", 50).collect())
    assert len(a) == 50 and a == b


def test_bottom_k_consistency_subset(spark):
    df = _docs(spark)
    small = {r.doc_id for r in bottom_k_sample(df, "doc_id", 30).collect()}
    large = {r.doc_id for r in bottom_k_sample(df, "doc_id", 80).collect()}
    assert small < large


def test_bottom_k_seed_changes_sample(spark):
    df = _docs(spark)
    a = {r.doc_id for r in bottom_k_sample(df, "doc_id", 50, seed=1).collect()}
    b = {r.doc_id for r in bottom_k_sample(df, "doc_id", 50, seed=2).collect()}
    assert a != b


def test_bottom_k_larger_than_input(spark):
    df = _docs(spark, n=10)
    assert bottom_k_sample(df, "doc_id", 999).count() == 10


def test_group_cap_binds_per_group(spark):
    df = _docs(spark, n=200, groups=4)  # 50 per group
    out = group_cap_sample(df, "source", "doc_id", 12).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
        assert r.sample_rank <= 12
    assert per == {f"g{i}": 12 for i in range(4)}


def test_group_cap_passes_small_groups_through(spark):
    df = _docs(spark, n=20, groups=4)  # 5 per group < cap
    assert group_cap_sample(df, "source", "doc_id", 12).count() == 20


def test_weighted_sample_prefers_heavy_rows(spark):
    from computer_vision_foundations_spark.operators.sample import (
        weighted_sample_k,
    )

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample_k(df, "doc_id", "w", 30).collect()
    assert len(out) == 30
    heavy = sum(1 for r in out if r.doc_id < 20)
    assert heavy == 20  # all heavy rows make the cut at 1000:1 odds
    # deterministic
    again = weighted_sample_k(df, "doc_id", "w", 30).collect()
    assert {r.doc_id for r in out} == {r.doc_id for r in again}
