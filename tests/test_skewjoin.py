"""Salted join: row-identical to the plain join (the whole point),
salt actually spreads a hot key, and the plan shuffles on (key, salt)."""

from pyspark.sql import Row, functions as F

from computer_vision_foundations_spark.operators.skewjoin import salted_join


def _data(spark):
    fact = spark.createDataFrame(
        [Row(rid=i, k="hot" if i % 10 else f"cold{i}", v=float(i))
         for i in range(1, 201)]
    )
    keys = {r["k"] for r in fact.select("k").distinct().collect()}
    dim = spark.createDataFrame([Row(k=k, w=len(k)) for k in sorted(keys)])
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _data(spark)
    plain = fact.join(dim, "k").select("rid", "k", "v", "w")
    salted = salted_join(fact, dim, "k", salt_from="rid", n_salts=8)
    got = sorted(map(tuple, salted.select("rid", "k", "v", "w").collect()))
    assert got == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark):
    fact, dim = _data(spark)
    joined = salted_join(fact, dim, "k", salt_from="rid", n_salts=8)
    # re-derive the salt the operator used: the hot key must span >1 salt
    n = (
        fact.filter(F.col("k") == "hot")
        .select(F.pmod(F.xxhash64("rid"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n > 1
    assert joined.count() == fact.count()  # inner join, all keys present


def test_salted_join_plan_is_shuffle_hash(spark):
    fact, dim = _data(spark)
    joined = salted_join(fact, dim, "k", salt_from="rid", n_salts=8)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
