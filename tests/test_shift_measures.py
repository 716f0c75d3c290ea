"""PSI and 1-D Wasserstein: closed-form and invariance checks."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.emd import wasserstein_1d
from computer_vision_foundations_spark.operators.psi import psi_bins


def test_psi_zero_for_identical_distributions(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(100)], ["b"])
    out = psi_bins(df, df, F.col("b")).collect()
    assert len(out) == 5
    # identical smoothed p and q per bin → every contribution exactly 0
    assert all(r.contrib == 0.0 and r.psi == 0.0 for r in out)


def test_psi_positive_under_shift_and_covers_union_of_bins(spark):
    ref = spark.createDataFrame([(0,)] * 90 + [(1,)] * 10, ["b"])
    cur = spark.createDataFrame([(1,)] * 90 + [(2,)] * 10, ["b"])
    out = {r.bin: r for r in psi_bins(ref, cur, F.col("b")).collect()}
    assert set(out) == {0, 1, 2}  # full outer: bins from either side
    assert out[0].n_cur == 0 and out[2].n_ref == 0
    psi = out[0].psi
    assert psi > 0.25  # a hard shift reads as "shifted"
    assert all(r.psi == psi for r in out.values())


def test_wasserstein_point_masses(spark):
    # all mass at 0 vs all mass at 10 → W1 exactly 10
    a = spark.createDataFrame([(0,)] * 7, ["v"])
    b = spark.createDataFrame([(10,)] * 3, ["v"])
    r = wasserstein_1d(a, b, F.col("v")).collect()[0]
    assert (r.n_a, r.n_b, r.w1) == (7, 3, 10.0)


def test_wasserstein_identical_is_zero_and_symmetric(spark):
    a = spark.createDataFrame([(i,) for i in range(20)], ["v"])
    b = spark.createDataFrame([(i + 5,) for i in range(20)], ["v"])
    same = wasserstein_1d(a, a, F.col("v")).collect()[0]
    assert same.w1 == 0.0
    ab = wasserstein_1d(a, b, F.col("v")).collect()[0]
    ba = wasserstein_1d(b, a, F.col("v")).collect()[0]
    assert ab.w1 == ba.w1 == 5.0  # pure translation by 5
