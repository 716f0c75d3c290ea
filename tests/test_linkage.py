

def test_jaro_winkler_matches_duckdb_native(spark):
    """The from-scratch JW comparator is bit-parity with DuckDB's
    jaro_winkler_similarity on classics, edge cases, and a seeded
    random sweep — the property za70's oracle depends on."""
    import random
    import string

    import duckdb
    from pyspark.sql import functions as F

    from computer_vision_foundations_spark.operators.linkage import (
        jaro_winkler_udf,
    )

    random.seed(13)
    cases = [
        ("martha", "marhta"), ("dwayne", "duane"), ("dixon", "dicksonx"),
        ("", ""), ("a", ""), ("same", "same"), ("ab", "ba"),
        ("aaaa", "aaaaaaaaaa"),
    ] + [
        (
            "".join(random.choices(string.ascii_lowercase[:6], k=random.randint(0, 12))),
            "".join(random.choices(string.ascii_lowercase[:6], k=random.randint(0, 12))),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select(
            "a", "b", jaro_winkler_udf()(F.col("a"), F.col("b")).alias("jw")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(got[(a, b)] - want) < 1e-12, (a, b, got[(a, b)], want)


def test_jaro_winkler_blocked_pairs_shape(spark):
    from computer_vision_foundations_spark.operators.linkage import (
        jaro_winkler_blocked_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "g1", "the quick brown fox"),
            (2, "g1", "the quick brown fix"),
            (3, "g1", "zzz totally different"),
            (4, "g2", "the quick brown fox"),  # other block: never paired
        ],
        "doc_id long, grp string, text string",
    )
    out = jaro_winkler_blocked_pairs(
        df, "text", "doc_id", ["grp"], threshold=0.9
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["jw"] > 0.9
