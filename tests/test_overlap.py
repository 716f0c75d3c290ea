import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.sketches import (
    kmv_distinct,
    kmv_registers,
)
from computer_vision_foundations_spark.operators.overlap import (
    kmv_group_stats,
    kmv_pairwise_overlap,
)


def _items(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, ["g", "v"])


def test_registers_are_bottom_k_distinct(spark):
    items = _items(spark, {"a": [str(i) for i in range(50)] * 2})
    regs = kmv_registers(items, "v", k=10, keys=["g"]).collect()
    assert len(regs) == 10
    hashes = sorted(r["h"] for r in regs)
    assert [r["h"] for r in sorted(regs, key=lambda r: r["pos"])] == hashes


def test_distinct_exact_below_k(spark):
    items = _items(spark, {"a": ["x", "y", "z", "x"]})
    out = kmv_distinct(items, "v", k=16, keys=["g"]).collect()
    assert out[0]["approx_distinct"] == 3.0


def test_distinct_estimate_accuracy(spark):
    items = _items(spark, {"a": [str(i) for i in range(5000)]})
    out = kmv_distinct(items, "v", k=256, keys=["g"]).collect()
    est = out[0]["approx_distinct"]
    assert est == pytest.approx(5000, rel=0.2)


def test_identical_groups_full_overlap(spark):
    vals = [str(i) for i in range(100)]
    items = _items(spark, {"a": vals, "b": vals})
    out = kmv_pairwise_overlap(items, "v", "g", k=256).collect()
    assert len(out) == 1
    r = out[0]
    # below k the sketch is exact: intersection == union == 100
    assert r["intersect_est"] == 100.0
    assert r["union_est"] == 100.0
    assert r["jaccard"] == 1.0


def test_disjoint_groups_emit_nothing(spark):
    items = _items(
        spark,
        {"a": [f"a{i}" for i in range(50)], "b": [f"b{i}" for i in range(50)]},
    )
    assert kmv_pairwise_overlap(items, "v", "g", k=64).count() == 0


def test_partial_overlap_estimates(spark):
    shared = [f"s{i}" for i in range(2000)]
    only_a = [f"a{i}" for i in range(2000)]
    only_b = [f"b{i}" for i in range(2000)]
    items = _items(spark, {"a": shared + only_a, "b": shared + only_b})
    out = kmv_pairwise_overlap(items, "v", "g", k=512).collect()
    r = out[0]
    assert r["intersect_est"] == pytest.approx(2000, rel=0.25)
    assert r["union_est"] == pytest.approx(6000, rel=0.25)
    assert r["jaccard"] == pytest.approx(1 / 3, rel=0.3)


def test_group_stats_theta_semantics(spark):
    items = _items(spark, {"a": [str(i) for i in range(10)]})
    regs = kmv_registers(items, "v", k=64, keys=["g"])
    st = kmv_group_stats(regs, "g", 64).collect()[0]
    assert st["n"] == 10 and st["theta"] == 1.0 and st["est"] == 10.0


def test_sketch_is_mergeable(spark):
    # bottom-k of the union == bottom-k of concatenated register tables
    vals = [str(i) for i in range(1000)]
    whole = _items(spark, {"a": vals})
    part1 = _items(spark, {"a": vals[:500]})
    part2 = _items(spark, {"a": vals[400:]})
    k = 32
    direct = kmv_registers(whole, "v", k=k, keys=["g"])
    merged_src = (
        kmv_registers(part1, "v", k=k, keys=["g"])
        .select("g", "h")
        .union(kmv_registers(part2, "v", k=k, keys=["g"]).select("g", "h"))
        .withColumnRenamed("h", "v")
    )
    # re-sketch the merged registers (md5 of a hash is a new value, so
    # compare the *sets*: re-rank distinct hashes instead)
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("v")
    remerged = (
        merged_src.distinct()
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
    )
    d = {r["pos"]: r["h"] for r in direct.collect()}
    m = {r["pos"]: r["v"] for r in remerged.collect()}
    assert d == m


def test_kmv_ignores_null_values(spark):
    rows = [("a", "x"), ("a", "y"), ("a", None), ("a", "z")]
    items = spark.createDataFrame(rows, ["g", "v"])
    regs = kmv_registers(items, "v", k=8, keys=["g"]).collect()
    # NULL is not a set member: 3 registers, positions 1..3, no NULL hash
    assert len(regs) == 3
    assert sorted(r["pos"] for r in regs) == [1, 2, 3]
    assert all(r["h"] is not None for r in regs)
    out = kmv_distinct(items, "v", k=8, keys=["g"]).collect()
    assert out[0]["approx_distinct"] == 3.0
