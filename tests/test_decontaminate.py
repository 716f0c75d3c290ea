"""Decontamination: overlap math on hand-built docs, complement
property, and the broadcast plan shape."""

import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.decontaminate import (
    contamination_pairs,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpora(spark):
    evals = spark.createDataFrame(
        [
            (1000, "alpha beta gamma delta epsilon"),
            (1001, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),       # exact eval copy
            (2, "x alpha beta gamma y"),                  # partial overlap
            (3, "totally unrelated words here indeed"),   # clean
            (4, "one two three something else entirely"), # partial of 1001
        ],
        "doc_id long, text string",
    )
    return train, evals


def test_overlap_fractions(spark, corpora):
    train, evals = corpora
    got = {
        (r.train_id, r.eval_id): r.overlap_frac
        for r in contamination_pairs(train, evals, k=3, min_frac=0.0).collect()
    }
    # eval 1000 has 3 distinct 3-grams; doc 1 shares all 3
    assert got[(1, 1000)] == 1.0
    # doc 2 shares exactly "alpha|beta|gamma" -> 1/3
    assert got[(2, 1000)] == round(1 / 3, 6)
    # doc 4 shares "one|two|three" with eval 1001 (4 shingles) -> 1/4
    assert got[(4, 1001)] == 0.25
    assert (3, 1000) not in got and (3, 1001) not in got


def test_threshold_filters(spark, corpora):
    train, evals = corpora
    ids = {
        r.train_id
        for r in contamination_pairs(train, evals, k=3, min_frac=0.5).collect()
    }
    assert ids == {1}


def test_decontaminate_complement(spark, corpora):
    train, evals = corpora
    kept = decontaminate(train, evals, k=3, min_frac=0.3)
    assert {r.doc_id for r in kept.collect()} == {3, 4}
    # untouched schema/columns
    assert kept.columns == train.columns


def test_eval_side_is_broadcast(spark, corpora):
    train, evals = corpora
    plan = (
        contamination_pairs(train, evals, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
