"""Split-operator properties (reference `03a_Model Training.py:74-96`).

The complement/determinism properties that the unseeded reference
cannot guarantee and our engine must (SURVEY §5).
"""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.split import (
    deterministic_split,
    train_test_split,
)


def _toy(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("key"), F.pmod("id", F.lit(2)).alias("label")
    )


def test_complement_property(spark):
    df = _toy(spark)
    train, test = train_test_split(df, "label", "key", 0.8, seed=7)
    n_all, n_train, n_test = df.count(), train.count(), test.count()
    assert n_train + n_test == n_all
    assert train.join(test, "key", "inner").count() == 0
    assert train.select("key").union(test.select("key")).distinct().count() == n_all


def test_seeded_determinism(spark):
    df = _toy(spark)
    t1, _ = train_test_split(df, "label", "key", 0.8, seed=42)
    t2, _ = train_test_split(df, "label", "key", 0.8, seed=42)
    assert sorted(r.key for r in t1.collect()) == sorted(r.key for r in t2.collect())


def test_stratified_fraction_rough(spark):
    df = _toy(spark, n=2000)
    train, _ = train_test_split(df, "label", "key", 0.8, seed=1)
    per_label = {r.label: r.n for r in train.groupBy("label").agg(F.count("*").alias("n")).collect()}
    for lab in (0, 1):
        assert 0.7 * 1000 < per_label[lab] < 0.9 * 1000


def test_deterministic_split_exact(spark):
    df = _toy(spark, n=1000)
    tagged = deterministic_split(df, "key", train_pct=80)
    counts = {r.eval_set: r.n for r in tagged.groupBy("eval_set").agg(F.count("*").alias("n")).collect()}
    assert counts == {"train": 800, "test": 200}


def test_temporal_split_partition_and_embargo(spark):
    import datetime

    from computer_vision_foundations_spark.operators.split import temporal_split

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i)) for i in range(100)]
    df = spark.createDataFrame(rows, "row_id long, ts timestamp")
    out = temporal_split(
        df, "ts", "2024-01-02 00:00:00", "2024-01-03 12:00:00"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.split, []).append(r.ts)
    # coverage: every row labeled, exactly once
    assert sum(len(v) for v in by.values()) == 100
    # no leakage: max(train) < min(purged) <= max(purged) < min(test)
    assert max(by["train"]) < min(by["purged"])
    assert max(by["purged"]) < min(by["test"])
    assert max(by["train"]) <= datetime.datetime(2024, 1, 2)
    assert min(by["test"]) >= datetime.datetime(2024, 1, 3, 12)


def test_temporal_split_rejects_misordered_bounds(spark):
    import pytest

    from computer_vision_foundations_spark.operators.split import temporal_split

    df = spark.createDataFrame([(1, "2024-01-01")], "row_id long, ts string")
    with pytest.raises(ValueError):
        temporal_split(df, "ts", "2024-03-01", "2024-02-01")
