"""DSIR importance weights (operators/dsir.py): hand-computed
reference, directional ranking, and smoothing behavior."""

import math

from computer_vision_foundations_spark.operators.dsir import dsir_logratio_weights


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_hand_computation(spark):
    raw = _df(spark, [(1, "a a b"), (2, "b c")])
    target = _df(spark, [(10, "a a a b")])
    # raw counts: a=2,b=2,c=1 (N=5); target: a=3,b=1,c=0 (N=4); V=3
    pt = {"a": 4 / 7, "b": 2 / 7, "c": 1 / 7}  # (cnt+1)/(4+3)
    pr = {"a": 3 / 8, "b": 3 / 8, "c": 2 / 8}  # (cnt+1)/(5+3)
    lr = {t: math.log2(pt[t]) - math.log2(pr[t]) for t in "abc"}
    out = {r.doc_id: r for r in dsir_logratio_weights(raw, target).collect()}
    assert out[1].n_tokens == 3
    assert abs(out[1].dsir_weight - (2 * lr["a"] + lr["b"]) / 3) < 1e-9
    assert abs(out[2].dsir_weight - (lr["b"] + lr["c"]) / 2) < 1e-9


def test_target_like_docs_rank_higher(spark):
    raw = _df(
        spark,
        [(1, "x y x y x y"), (2, "quality prose tokens here"), (3, "x x y y")],
    )
    target = _df(spark, [(10, "quality prose tokens everywhere always")])
    out = {
        r.doc_id: r.dsir_weight
        for r in dsir_logratio_weights(raw, target).collect()
    }
    assert out[2] > out[1] and out[2] > out[3]


def test_token_absent_from_target_stays_finite(spark):
    raw = _df(spark, [(1, "only raw token")])
    target = _df(spark, [(10, "different words entirely")])
    rows = dsir_logratio_weights(raw, target).collect()
    assert len(rows) == 1 and math.isfinite(rows[0].dsir_weight)
    assert rows[0].dsir_weight < 0  # nothing target-like about it


def test_identical_corpora_give_zero(spark):
    raw = _df(spark, [(1, "a b c"), (2, "c b a")])
    out = dsir_logratio_weights(raw, raw).collect()
    for r in out:
        assert abs(r.dsir_weight) < 1e-12
