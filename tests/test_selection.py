import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.selection import (
    curriculum_order,
    quality_budget_select,
)


@pytest.fixture(scope="module")
def scored(spark):
    # (doc_id, source, quality, n_tokens)
    rows = [
        (1, "a", 0.9, 40),
        (2, "a", 0.8, 50),   # cum 90
        (3, "a", 0.7, 20),   # cum 110 > 100: cut
        (4, "a", 0.6, 5),    # after an overflow nothing re-enters
        (5, "b", 0.5, 200),  # oversized head: cut immediately
        (6, "b", 0.4, 50),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "source", "quality", "n_tokens"]
    )


def test_greedy_prefix_rule(scored):
    out = {
        r["doc_id"]: r.asDict()
        for r in quality_budget_select(
            scored, domain_col="source", token_budget=100
        ).collect()
    }
    assert [out[i]["selected"] for i in (1, 2, 3, 4)] == [
        True,
        True,
        False,
        False,
    ]
    assert out[2]["cum_tokens"] == 90
    # strict prefix: an oversized best doc blocks the whole domain
    assert not out[5]["selected"] and not out[6]["selected"]


def test_tie_break_by_id(spark):
    rows = [(2, "a", 0.5, 60), (1, "a", 0.5, 60)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality", "n_tokens"])
    out = {
        r["doc_id"]: r["selected"]
        for r in quality_budget_select(
            df, domain_col="source", token_budget=60
        ).collect()
    }
    assert out == {1: True, 2: False}


def test_curriculum_buckets_and_interleave(spark):
    rows = [(i, float(i)) for i in range(1, 9)]  # difficulty 1..8
    df = spark.createDataFrame(rows, ["doc_id", "difficulty"])
    out = curriculum_order(df, [2.0, 4.0, 6.0]).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert [by_doc[i]["bucket"] for i in range(1, 9)] == [
        1, 1, 2, 2, 3, 3, 4, 4,
    ]
    # order by curriculum_rank cycles buckets 1,2,3,4,1,2,3,4
    ordered = sorted(out, key=lambda r: r["curriculum_rank"])
    assert [r["bucket"] for r in ordered] == [1, 2, 3, 4, 1, 2, 3, 4]
    # and difficulty rises within each bucket's visits
    assert [r["doc_id"] for r in ordered] == [1, 3, 5, 7, 2, 4, 6, 8]


def test_curriculum_rank_is_unique_total_order(spark):
    rows = [(i, float(i % 5)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, ["doc_id", "difficulty"])
    out = curriculum_order(df, [1.0, 3.0]).collect()
    ranks = [r["curriculum_rank"] for r in out]
    assert len(ranks) == len(set(ranks))


def test_no_global_single_partition_window(spark):
    rows = [(i, float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, ["doc_id", "difficulty"])
    plan = (
        curriculum_order(df, [4.0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # bucketed window partitions by bucket, never SinglePartition
    assert "SinglePartition" not in plan


def test_keep_best_per_cluster(spark):
    from computer_vision_foundations_spark.operators.selection import (
        keep_best_per_cluster,
    )
    from pyspark.sql import functions as F  # noqa: F401

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component long",
    )
    quality = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 2.0), (99, 0.5)],
        "doc_id long, score double",
    )
    out = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in keep_best_per_cluster(clusters, quality).collect()
    }
    # cluster 1: 2 and 3 tie on score -> smallest id (2) wins
    assert out[2] == (1, True) and out[3] == (1, False)
    assert out[1] == (1, False)
    # cluster 10: higher score wins
    assert out[11] == (10, True) and out[10] == (10, False)
    # unclustered doc is its own singleton keeper
    assert out[99] == (99, True)
