"""Bucketed tables / co-located joins (sources/bucketed.py).

Pins the property the module exists for: a join between two tables
bucketed on the join key plans WITHOUT an Exchange on either side,
and the bucketed layout is result-invisible.
"""

import os
import tempfile

import pytest

import pyspark.sql.functions as F

from computer_vision_foundations_spark.sources.bucketed import (
    colocated_join,
    plan_has_exchange,
    write_bucketed,
)
from computer_vision_foundations_spark.sources.tables import (
    create_database,
    drop_database,
)


@pytest.fixture
def scratch_db(spark):
    root = tempfile.mkdtemp(prefix="bktest_")
    db = "bktest_" + os.path.basename(root)[7:]
    create_database(spark, db, location=root)
    yield db
    drop_database(spark, db)


def _fixture_frames(spark):
    orders = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("k"),
        (F.col("id") * 3).cast("double").alias("amount"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg"), (F.col("id") % 5)).alias("segment"),
    )
    return orders, dim


def test_bucketed_join_has_no_exchange(spark, scratch_db):
    orders, dim = _fixture_frames(spark)
    write_bucketed(orders, f"{scratch_db}.o", 4, ["k"], ["k"])
    write_bucketed(dim, f"{scratch_db}.d", 4, ["k"], ["k"])
    joined = colocated_join(spark, f"{scratch_db}.o", f"{scratch_db}.d", "k")
    assert not plan_has_exchange(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the same join on non-bucketed frames DOES shuffle
    plain = orders.hint("merge").join(dim, "k")
    assert plan_has_exchange(plain)


def test_bucketed_join_results_match_plain_join(spark, scratch_db):
    orders, dim = _fixture_frames(spark)
    write_bucketed(orders, f"{scratch_db}.o2", 4, ["k"], ["k"])
    write_bucketed(dim, f"{scratch_db}.d2", 4, ["k"], ["k"])
    got = (
        colocated_join(spark, f"{scratch_db}.o2", f"{scratch_db}.d2", "k")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    )
    want = (
        orders.join(dim, "k")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bucket_files_carry_bucket_ids(spark, scratch_db):
    orders, _ = _fixture_frames(spark)
    write_bucketed(orders, f"{scratch_db}.o3", 4, ["k"])
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {scratch_db}.o3")
        .filter("col_name = 'Location'")
        .collect()[0]
        .data_type
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    # bucketed file names embed the 5-digit bucket id suffix
    buckets = {f.split("_")[-1].split(".")[0] for f in files}
    assert buckets <= {"00000", "00001", "00002", "00003"}
    assert len(buckets) >= 2


def test_write_bucketed_rejects_bad_bucket_count(spark):
    orders, _ = _fixture_frames(spark)
    with pytest.raises(ValueError):
        write_bucketed(orders, "nope", 0, ["k"])
