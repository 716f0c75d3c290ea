"""Mixture sampling: fraction math, determinism, mix proportions, and
the no-shuffle plan shape."""

import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.mixture import (
    hash_unit,
    mixture_fractions,
    mixture_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(3000):
        dom = ("web", "books", "code")[i % 3]
        rows.append((i, dom, 100))
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_fractions_cap_and_proportion(spark, corpus):
    # each domain holds 100k tokens; budget 150k at weights 2:1:0
    fr = {
        r.domain: (r.keep_frac, r.n_tokens)
        for r in mixture_fractions(
            corpus, {"web": 2.0, "books": 1.0}, 150_000.0,
            domain_col="source", token_col="n_chars",
        ).collect()
    }
    assert fr["web"][0] == 1.0          # target 100k == size, capped
    assert abs(fr["books"][0] - 0.5) < 1e-12   # target 50k of 100k
    assert fr["code"][0] == 0.0         # unweighted -> dropped


def test_sample_deterministic_and_mix(spark, corpus):
    out = mixture_sample(
        corpus, {"web": 2.0, "books": 1.0}, 150_000.0,
        domain_col="source", token_col="n_chars", seed=7,
    )
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["web"] == 1000                     # frac 1.0 keeps all
    assert abs(counts.get("books", 0) - 500) < 80    # ~binomial(1000, .5)
    assert "code" not in counts
    again = mixture_sample(
        corpus, {"web": 2.0, "books": 1.0}, 150_000.0,
        domain_col="source", token_col="n_chars", seed=7,
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_unit_range_and_seed_sensitivity(spark, corpus):
    u = corpus.select(
        hash_unit("doc_id", 1).alias("u1"), hash_unit("doc_id", 2).alias("u2")
    )
    row = u.agg(
        F.min("u1").alias("lo"), F.max("u1").alias("hi"),
        F.avg((F.col("u1") < F.col("u2")).cast("int")).alias("flip"),
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert 0.3 < row.flip < 0.7  # different seeds decorrelate


def test_plan_broadcasts_fractions(spark, corpus):
    out = mixture_sample(
        corpus, {"web": 1.0}, 10_000.0, domain_col="source", token_col="n_chars"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_repetition_epochs(spark, corpus):
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample_with_repetition,
    )

    # books: 100k tokens, target 250k -> f=2.5: 2 copies + ~half a third
    out = mixture_sample_with_repetition(
        corpus, {"books": 1.0}, 250_000.0,
        domain_col="source", token_col="n_chars", seed=3,
    )
    rows = out.collect()
    assert {r.source for r in rows} == {"books"}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
    for eps in per_doc.values():
        assert sorted(eps) == list(range(1, len(eps) + 1))  # epochs 1..n
        assert len(eps) in (2, 3)
    n_three = sum(1 for eps in per_doc.values() if len(eps) == 3)
    assert abs(n_three - 500) < 80  # remainder ~0.5 of 1000 docs


def test_repetition_cap(spark, corpus):
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample_with_repetition,
    )

    out = mixture_sample_with_repetition(
        corpus, {"code": 1.0}, 10_000_000.0,
        domain_col="source", token_col="n_chars", max_repeat=2.0,
    )
    n = out.count()
    assert n == 2000  # capped at 2 epochs for all 1000 docs


def test_top_fraction_per_group(spark):
    from computer_vision_foundations_spark.operators.mixture import (
        top_fraction_per_group,
    )

    rows = [(g, i, float(i % 10)) for g in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, rid long, score double")
    out = top_fraction_per_group(df, "grp", "score", 0.25, tiebreak_col="rid")
    got = out.collect()
    # percent_rank = (rank-1)/99 <= .25 keeps ranks 1..25 per group
    assert {r.grp for r in got} == {"a", "b"}
    per = {}
    for r in got:
        per.setdefault(r.grp, []).append(r.score)
    for scores in per.values():
        assert len(scores) == 25
        assert min(scores) >= 7.0  # top quartile of 0..9 scores
    # single-row groups always keep their row
    one = spark.createDataFrame([("x", 1, 0.5)], "grp string, rid long, score double")
    assert top_fraction_per_group(one, "grp", "score", 0.0, "rid").count() == 1


def test_mixture_partitioning_invariance(spark, corpus):
    sel = lambda df: sorted(
        r.doc_id
        for r in mixture_sample(
            df, {"books": 1.0}, 50_000.0,
            domain_col="source", token_col="n_chars", seed=5,
        ).collect()
    )
    assert sel(corpus.repartition(3)) == sel(corpus.repartition(17))


def test_temperature_fractions_limits(spark):
    from computer_vision_foundations_spark.operators.mixture import (
        temperature_fractions,
    )

    rows = [(i, "a" if i < 90 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    t1 = {r.domain: r for r in temperature_fractions(df, 1.0, 50).collect()}
    # T=1: natural proportions
    assert abs(t1["a"].mix_weight - 0.9) < 1e-9
    assert abs(t1["b"].mix_weight - 0.1) < 1e-9
    t_hot = {r.domain: r for r in temperature_fractions(df, 100.0, 50).collect()}
    # T->inf: near-uniform
    assert abs(t_hot["a"].mix_weight - 0.5) < 0.02
    # weights always sum to 1; keep_frac capped at 1
    for t in (t1, t_hot):
        assert abs(sum(r.mix_weight for r in t.values()) - 1.0) < 1e-9
        assert all(r.keep_frac <= 1.0 for r in t.values())


def test_temperature_boosts_tail_domain(spark):
    from computer_vision_foundations_spark.operators.mixture import (
        temperature_fractions,
    )

    rows = [(i, "big" if i < 95 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    t1 = {r.domain: r.mix_weight for r in temperature_fractions(df, 1.0, 10).collect()}
    t3 = {r.domain: r.mix_weight for r in temperature_fractions(df, 3.0, 10).collect()}
    assert t3["small"] > t1["small"]
    assert t3["big"] < t1["big"]


def test_temperature_rejects_nonpositive(spark):
    import pytest

    from computer_vision_foundations_spark.operators.mixture import (
        temperature_fractions,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        temperature_fractions(df, 0.0, 10)
