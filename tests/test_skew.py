

def test_skew_profile_identifies_hot_key(spark):
    from computer_vision_foundations_spark.operators.skew import skew_profile

    rows = [(i, 1) for i in range(90)] + [(i + 90, k) for i, k in enumerate([2, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    df = spark.createDataFrame(rows, "row_id long, key long")
    out = skew_profile(df, "key", top_n=3).collect()
    assert out[0].key == 1 and out[0].n_rows == 90
    assert abs(out[0].share - 0.9) < 1e-9
    assert out[0].suggested_salt > 1  # 90 rows vs mean ~10
    assert out[1].key == 2 and out[1].n_rows == 2


def test_skew_profile_explicit_target(spark):
    from computer_vision_foundations_spark.operators.skew import skew_profile

    rows = [(i, 1) for i in range(100)]
    df = spark.createDataFrame(rows, "row_id long, key long")
    out = skew_profile(df, "key", top_n=1, salt_target=25).collect()
    assert out[0].suggested_salt == 4
