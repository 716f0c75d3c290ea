import math

import pytest

from computer_vision_foundations_spark.operators.privacy import (
    k_anonymity_report,
    suppression_candidates,
)
from computer_vision_foundations_spark.operators.vocab import zipf_fit


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "US", "en"), (2, "US", "en"), (3, "US", "en"),
        (4, "FR", "fr"), (5, "FR", "fr"),
        (6, "DE", "de"),  # singleton class
    ]
    return spark.createDataFrame(rows, ["doc_id", "country", "lang"])


def test_report_class_sizes_and_flags(people):
    out = {
        (r["country"], r["lang"]): r
        for r in k_anonymity_report(people, ["country", "lang"], k=3).collect()
    }
    assert out[("US", "en")]["class_size"] == 3
    assert not out[("US", "en")]["at_risk"]
    assert out[("FR", "fr")]["at_risk"]
    assert out[("DE", "de")]["at_risk"]


def test_suppression_candidates_exactly_violating_rows(people):
    ids = {
        r["doc_id"]
        for r in suppression_candidates(
            people, ["country", "lang"], k=3
        ).collect()
    }
    assert ids == {4, 5, 6}


def test_k1_never_flags(people):
    out = k_anonymity_report(people, ["country", "lang"], k=1).collect()
    assert all(not r["at_risk"] for r in out)


def test_zipf_fit_on_exact_power_law(spark):
    # frequencies n = round(1000 / rank): slope should be ~ -1, r2 ~ 1
    rows = []
    did = 0
    for rank in range(1, 21):
        n = max(1000 // rank, 1)
        for _ in range(n):
            rows.append((did, f"w{rank:02d}"))
            did += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = zipf_fit(df, v=20).collect()[0]
    assert out["n_terms"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.02)
    assert out["r2"] > 0.999


def test_zipf_fit_flat_corpus_slope_zero(spark):
    # every token equally frequent -> slope 0, r2 ~ 0/0 guarded by data
    rows = [(i, f"tok{i % 10}") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = zipf_fit(df, v=10).collect()[0]
    assert out["slope"] == pytest.approx(0.0, abs=1e-9)
    assert math.isnan(out["r2"]) or out["r2"] == pytest.approx(0.0, abs=1e-6)


def test_null_qi_rows_are_suppression_candidates(spark):
    rows = [
        (1, "US", None), (2, "US", None),        # NULL-lang class of 2
        (3, "US", "en"), (4, "US", "en"), (5, "US", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "country", "lang"])
    rep = {
        (r["country"], r["lang"]): r
        for r in k_anonymity_report(df, ["country", "lang"], k=3).collect()
    }
    assert rep[("US", None)]["at_risk"]
    ids = {
        r["doc_id"]
        for r in suppression_candidates(df, ["country", "lang"], k=3).collect()
    }
    # null-safe join: the NULL-keyed rows are NOT silently exempted
    assert ids == {1, 2}
