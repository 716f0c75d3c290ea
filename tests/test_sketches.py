"""Sketch operators: accuracy bounds and mergeability."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.sketches import (
    count_min_estimate,
    count_min_registers,
    hll_count_distinct,
    hll_registers,
)


def _values(spark, n=5000, mod=1700):
    return spark.range(n).select(
        (F.col("id") % mod).cast("string").alias("v"),
        (F.col("id") % 2).alias("g"),
    )


def test_hll_within_expected_error(spark):
    df = _values(spark)
    est = hll_count_distinct(df, "v", p=10).collect()[0].approx_distinct
    assert abs(est - 1700) / 1700 < 0.1  # 3 sigma at p=10 is ~10%


def test_hll_grouped(spark):
    df = _values(spark)
    rows = {r.g: r.approx_distinct for r in hll_count_distinct(df, "v", p=10, keys=["g"]).collect()}
    assert set(rows) == {0, 1}
    for est in rows.values():
        assert abs(est - 850) / 850 < 0.12


def test_hll_registers_merge(spark):
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) by max over buckets
    df = _values(spark)
    a, b = df.filter("g = 0"), df.filter("g = 1")
    merged = (
        hll_registers(a, "v", p=8)
        .unionByName(hll_registers(b, "v", p=8))
        .groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    direct = hll_registers(df, "v", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_count_min_never_undercounts(spark):
    df = _values(spark, n=3000, mod=200)
    regs = count_min_registers(df, "v", d=4, w=256)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    est = count_min_estimate(regs, exact, "v", d=4, w=256)
    bad = est.filter(F.col("cm_estimate") < F.col("n")).count()
    assert bad == 0
    # with 200 keys in 256 slots x 4 rows, estimates stay close
    avg_over = est.select(
        F.avg(F.col("cm_estimate") - F.col("n"))
    ).collect()[0][0]
    assert avg_over < 30


def test_count_min_registers_bounded(spark):
    df = _values(spark, n=2000, mod=500)
    regs = count_min_registers(df, "v", d=4, w=128)
    assert regs.count() <= 4 * 128
    total = regs.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r.s == 2000 for r in total)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from computer_vision_foundations_spark.functions.sketches import (
        bloom_bits,
        bloom_membership,
    )

    members = spark.createDataFrame(
        [(f"item-{i}",) for i in range(500)], "v string"
    )
    probes = spark.createDataFrame(
        [(f"item-{i}",) for i in range(1000)], "v string"
    )
    bits = bloom_bits(members, "v", m=65536, k=5)
    out = {
        r.v: r.maybe_member
        for r in bloom_membership(probes, "v", bits, ["v"], m=65536, k=5).collect()
    }
    # no false negatives
    assert all(out[f"item-{i}"] for i in range(500))
    # false positives bounded: n*k/m ~ 0.038 load -> fp ~ (1-e^-.038)^5 ~ 7e-8
    fp = sum(1 for i in range(500, 1000) if out[f"item-{i}"])
    assert fp <= 2


def test_bloom_bits_mergeable(spark):
    from computer_vision_foundations_spark.functions.sketches import bloom_bits

    a = spark.createDataFrame([("x1",), ("x2",)], "v string")
    b = spark.createDataFrame([("x2",), ("x3",)], "v string")
    both = spark.createDataFrame([("x1",), ("x2",), ("x3",)], "v string")
    merged = bloom_bits(a, "v").unionByName(bloom_bits(b, "v")).distinct()
    direct = bloom_bits(both, "v")
    assert {r.bit for r in merged.collect()} == {r.bit for r in direct.collect()}
