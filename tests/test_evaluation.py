"""ann_recall/mean_recall: exact intersection math on hand-built
result sets, including probes the index missed entirely."""

from computer_vision_foundations_spark.operators.evaluation import (
    ann_recall,
    mean_recall,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, "probe_id long, neighbor_id long")


def test_recall_counts_intersection(spark):
    exact = _results(spark, [(1, n) for n in (10, 11, 12)] + [(2, n) for n in (20, 21, 22)])
    approx = _results(spark, [(1, 10), (1, 12), (1, 99), (2, 77), (2, 78), (2, 79)])
    got = {r.probe_id: (r.n_hits, r.recall) for r in ann_recall(approx, exact, k=3).collect()}
    assert got[1] == (2, round(2 / 3, 6))
    assert got[2] == (0, 0.0)


def test_probe_missing_from_approx_scores_zero(spark):
    exact = _results(spark, [(1, 10), (2, 20)])
    approx = _results(spark, [(1, 10)])  # probe 2 absent entirely
    got = {r.probe_id: r.n_hits for r in ann_recall(approx, exact, k=1).collect()}
    assert got == {1: 1, 2: 0}


def test_mean_recall(spark):
    exact = _results(spark, [(1, 10), (2, 20)])
    approx = _results(spark, [(1, 10), (2, 99)])
    row = mean_recall(approx, exact, k=1).collect()[0]
    assert row.mean_recall == 0.5
    assert row.n_probes == 2


def test_recall_denominator_capped_by_exact_count(spark):
    """A probe whose ground-truth set has fewer than k rows must be
    able to reach recall 1.0 when the index returns every true
    neighbor (ADVICE r2: denominator = min(k, |exact|))."""
    exact = _results(spark, [(1, 10), (1, 11)])  # only 2 true neighbors
    approx = _results(spark, [(1, 10), (1, 11), (1, 99)])
    got = ann_recall(approx, exact, k=10).collect()[0]
    assert (got.n_hits, got.recall) == (2, 1.0)
