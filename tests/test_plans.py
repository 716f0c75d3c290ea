"""Physical-plan assertions: the optimizations the 100 TB design
depends on must be visible in the executed plan, not assumed.

- predicate pushdown + column pruning reach the parquet scan
- partition-pruned reads list only matching partitions
- broadcast joins stay broadcast for dimension tables
- whole-stage codegen covers the relational hot path
"""

import os

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    spark.range(1000).select(
        "id", (F.col("id") % 7).alias("a"), F.lit("x").alias("pad")
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("a") > 3).select("id", "a")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(a), GreaterThan(a,3)]" in plan, plan
    assert "pad" not in plan.split("ReadSchema")[1].splitlines()[0], plan


def test_partition_pruning_lists_only_matching_partitions(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    df = spark.range(100).select(
        "id", (F.col("id") % 4).alias("part")
    )
    df.write.partitionBy("part").parquet(p)
    pruned = spark.read.parquet(p).filter(F.col("part") == 2)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan, plan
    # the pruned scan must read 1 of the 4 partition directories
    scanned = pruned.select(F.input_file_name()).distinct().collect()
    assert all("part=2" in r[0] for r in scanned)


def test_dimension_join_is_broadcast(spark, tmp_path):
    fact = spark.range(10_000).select("id", (F.col("id") % 5).alias("k"))
    dim = spark.range(5).select(
        F.col("id").alias("k"), F.lit("name").alias("v")
    )
    plan = _plan(fact.join(F.broadcast(dim), "k"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_relational_core_is_whole_stage_codegen(spark):
    df = (
        spark.range(10_000)
        .select("id", (F.col("id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
        .filter(F.col("s") > 0)
    )
    df.collect()  # AQE only finalizes (and codegens) stages on execution
    plan = _plan(df)
    # codegen'd spans print as "*(n) Operator" in the executed plan;
    # both aggregates and the filter must sit inside one
    final = plan.split("== Initial Plan ==")[0]
    assert "*(2) Filter" in final and "*(1) HashAggregate" in final, plan
