"""Quantile normalization (operators/qnorm)."""

import pytest

from computer_vision_foundations_spark.operators.qnorm import (
    quantile_normalize,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_extremes_map_to_global_extremes(spark):
    # two sources on different scales
    df = _df(
        spark,
        [
            (1, "a", 10),
            (2, "a", 20),
            (3, "a", 30),
            (4, "b", 1000),
            (5, "b", 2000),
            (6, "b", 3000),
        ],
    )
    got = {
        r["id"]: r["qnorm"]
        for r in quantile_normalize(df, "n_chars").collect()
    }
    # each source's min maps to the GLOBAL min, max to global max
    assert got[1] == 10.0 and got[4] == 10.0
    assert got[3] == 3000.0 and got[6] == 3000.0
    # medians map to the global median position (p=0.5 → pos 3.5 →
    # lerp between 3rd and 4th global values: (30+1000)/2)
    assert got[2] == pytest.approx(515.0)
    assert got[5] == pytest.approx(515.0)


def test_identical_distributions_are_fixed_points(spark):
    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3])] + [
        (i + 10, "b", v) for i, v in enumerate([1, 2, 3])
    ]
    df = _df(spark, rows)
    for r in quantile_normalize(df, "n_chars").collect():
        # global distribution = each source's distribution (doubled);
        # every value maps onto (approximately) itself
        assert r["qnorm"] == pytest.approx(float(r["score"]), abs=0.5)


def test_output_distributions_match_across_sources(spark):
    df = _df(
        spark,
        [(1, "a", 5), (2, "a", 50), (3, "b", 7), (4, "b", 9)],
    )
    got = quantile_normalize(df, "n_chars").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["grp"], []).append(r["qnorm"])
    # after the transform both sources span the same global range
    assert sorted(by_src["a"]) == sorted(by_src["b"])


def test_global_row_number_equals_single_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from computer_vision_foundations_spark.operators.qnorm import (
        global_row_number,
    )

    rng = random.Random(5)
    rows = [(i, rng.randint(0, 20)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["v", "id"]).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want
