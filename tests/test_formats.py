"""Source/sink format coverage beyond parquet: CSV, JSON, ORC
round-trips preserve values and schema; mergeSchema unions evolved
parquet schemas."""

import os

from pyspark.sql import functions as F


def _df(spark):
    return spark.range(50).select(
        "id",
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )


def _assert_same(a, b, cast=None):
    ac, bc = a.orderBy("id").collect(), b.orderBy("id").collect()
    assert [tuple(r) for r in ac] == [tuple(r) for r in bc]


def test_csv_roundtrip_with_header_and_schema(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t.csv")
    df = _df(spark)
    df.write.option("header", True).csv(p)
    back = spark.read.option("header", True).schema(df.schema).csv(p)
    _assert_same(df, back)


def test_json_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t.json")
    df = _df(spark)
    df.write.json(p)
    back = spark.read.schema(df.schema).json(p)
    _assert_same(df, back)


def test_orc_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t.orc")
    df = _df(spark)
    df.write.orc(p)
    _assert_same(df, spark.read.orc(p))


def test_parquet_schema_evolution_merge(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    spark.range(5).select("id", F.lit(1).alias("a")).write.parquet(
        os.path.join(p, "v1")
    )
    spark.range(5).select(
        "id", F.lit("x").alias("b")
    ).write.parquet(os.path.join(p, "v2"))
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(p, "v1"), os.path.join(p, "v2")
    )
    assert set(merged.columns) == {"id", "a", "b"}
    assert merged.count() == 10
    assert merged.filter(F.col("a").isNull()).count() == 5
