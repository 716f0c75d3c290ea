"""Interval coverage: agreement with a pure-Python merge, including
the running-max case (early long interval swallowing later ones)."""

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.intervals import (
    interval_coverage,
)


def _py_coverage(intervals):
    out = {}
    for k, ivs in intervals.items():
        islands = []
        for st, en in sorted(ivs):
            if islands and st <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], en)
            else:
                islands.append([st, en])
        lens = [b - a for a, b in islands]
        out[k] = (len(islands), sum(lens), max(lens))
    return out


CASES = {
    1: [(0, 10), (5, 15), (20, 30)],          # overlap + gap
    2: [(0, 100), (10, 20), (30, 40), (150, 160)],  # swallow: running max
    3: [(0, 10), (10, 20)],                    # touching -> one island
    4: [(7, 9)],                               # singleton
}


def test_interval_coverage_matches_python(spark):
    rows = [
        Row(k=k, st=st, en=en, tb=i)
        for k, ivs in CASES.items()
        for i, (st, en) in enumerate(ivs)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["key"]: (r["n_islands"], r["covered"], r["longest"])
        for r in interval_coverage(df, "k", "st", "en", "tb").collect()
    }
    assert got == _py_coverage(CASES)
    assert got[2] == (2, 110, 100)  # the swallow case
    assert got[3] == (1, 20, 20)   # touching intervals merge
