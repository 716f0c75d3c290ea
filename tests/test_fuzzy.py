"""Fuzzy-match join vs brute-force levenshtein on small frames."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.fuzzy import fuzzy_match_pairs


def _brute(df, k):
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    return {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .withColumn("d", F.levenshtein("sa", "sb"))
        .filter(F.col("d") <= k)
        .collect()
    }


def test_matches_bruteforce(spark):
    rows = [
        (1, "chocolate lace"),
        (2, "chocolate face"),      # dist 1 from 1
        (3, "chocolate laces"),     # dist 1 from 1, 2 from 2
        (4, "vanilla swirl"),
        (5, "vanilla swirls"),      # dist 1 from 4
        (6, "completely different"),
        (7, "xx"),                  # shorter than q: excluded by contract
        (8, "xy"),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_match_pairs(df, "s", "id", max_distance=2, q=3).collect()
    }
    assert got == _brute(df.filter(F.length("s") >= 3), 2)


def test_hot_gram_cap_bounds_fanout(spark):
    # 50 strings sharing only a stop prefix; cap removes the prefix
    # grams so no candidate pairs form from it
    rows = [(i, f"PREFIX-{i:04d}-{'u' * (i % 5)}") for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "s"])
    out = fuzzy_match_pairs(
        df, "s", "id", max_distance=1, q=3, max_gram_freq=10
    )
    brute = _brute(
        df.select("id", F.col("s").alias("s")).withColumnRenamed("s", "s"), 1
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # capped blocking may only MISS pairs, never invent them
    assert got <= brute
