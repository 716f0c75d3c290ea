"""2-D skyline: window rewrite vs a brute-force Python oracle,
tie semantics, and pass-through of extra columns."""

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.skyline import skyline_2d


def _brute(rows):
    """(key, ord, val, id) rows on the skyline by quadratic check."""
    keep = []
    for a in rows:
        dominated = any(
            b[0] == a[0]
            and b[2] >= a[2]
            and b[1] <= a[1]
            and (b[2] > a[2] or b[1] < a[1])
            for b in rows
        )
        if not dominated:
            keep.append(a)
    return sorted(keep)


def _run(spark, rows):
    df = spark.createDataFrame(
        [Row(key=k, ord=o, val=float(v), rid=i) for k, o, v, i in rows]
    )
    got = skyline_2d(df, "key", "ord", "val").collect()
    return sorted((r["key"], r["ord"], r["val"], r["rid"]) for r in got)


def test_skyline_matches_bruteforce(spark):
    rows = [
        ("a", 1, 10.0, 1),
        ("a", 2, 12.0, 2),  # later but higher -> kept
        ("a", 3, 11.0, 3),  # dominated by rid=2
        ("a", 5, 12.0, 4),  # dominated by rid=2 (same val, later)
        ("b", 1, 1.0, 5),
        ("b", 1, 2.0, 6),  # same ord, higher -> dominates rid=5
    ]
    assert _run(spark, rows) == _brute(
        [(k, o, float(v), i) for k, o, v, i in rows]
    )


def test_skyline_keeps_exact_duplicates(spark):
    # identical (ord, val) twins: neither strictly dominates the other
    rows = [("a", 1, 5.0, 1), ("a", 1, 5.0, 2)]
    assert _run(spark, rows) == _brute(
        [(k, o, float(v), i) for k, o, v, i in rows]
    )


def test_skyline_single_row_and_monotone(spark):
    rows = [("a", 1, 9.0, 1), ("b", 1, 1.0, 2), ("b", 2, 2.0, 3),
            ("b", 3, 3.0, 4)]
    # strictly increasing val over ord -> every b row is on the frontier
    assert _run(spark, rows) == _brute(
        [(k, o, float(v), i) for k, o, v, i in rows]
    )
