"""Exact substring-span dedup (operators/spans.py): island merging,
thresholds, and the fraction profile on hand-built corpora."""

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.spans import (
    duplicated_span_islands,
    duplicated_span_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_marked_in_both_docs(spark):
    shared = "a b c d"  # n=4 span shared verbatim
    df = _docs(
        spark,
        [(1, f"x y {shared} z w"), (2, f"p {shared} q r s")],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(df, n=4).collect()
    }
    assert out[1]["dup_islands"] == 1 and out[1]["dup_tokens"] == 4
    assert out[2]["dup_islands"] == 1 and out[2]["dup_tokens"] == 4
    assert out[1]["dup_fraction"] == pytest.approx(4 / 8)


def test_overlapping_windows_merge_to_one_island(spark):
    # 6 shared tokens with n=4 -> 3 overlapping windows -> one island
    shared = "a b c d e f"
    df = _docs(spark, [(1, f"x {shared} y"), (2, f"{shared} q r")])
    islands = duplicated_span_islands(df, n=4).collect()
    by_doc = {}
    for r in islands:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1
    isl = by_doc[1][0]
    assert isl["island_end"] - isl["island_start"] == 6


def test_disjoint_spans_stay_separate_islands(spark):
    a, b = "a b c d", "p q r s"
    df = _docs(
        spark,
        [(1, f"{a} x y z w {b}"), (2, f"{a} m n o t {b}")],
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, n=4).collect()}
    assert out[1]["dup_islands"] == 2
    assert out[1]["dup_tokens"] == 8


def test_within_doc_repetition_not_counted_by_default(spark):
    # span repeated twice in ONE doc only: distinct-doc freq is 1
    df = _docs(
        spark,
        [(1, "a b c d x a b c d"), (2, "unrelated text entirely here now")],
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, n=4).collect()}
    assert out[1]["dup_tokens"] == 0


def test_short_docs_report_zero(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])
    out = duplicated_span_stats(df, n=4).collect()
    assert all(r["dup_tokens"] == 0 and r["n_tokens"] == 2 for r in out)


def test_min_doc_freq_threshold(spark):
    shared = "a b c d"
    df = _docs(
        spark,
        [(1, f"{shared} x y z"), (2, f"{shared} p q r"), (3, f"{shared} m n o")],
    )
    loose = duplicated_span_stats(df, n=4, min_doc_freq=2).collect()
    strict = duplicated_span_stats(df, n=4, min_doc_freq=4).collect()
    assert all(r["dup_tokens"] == 4 for r in loose)
    assert all(r["dup_tokens"] == 0 for r in strict)


def test_no_python_udf_in_plan(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d f")])
    plan = duplicated_span_stats(df, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
