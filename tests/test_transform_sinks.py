"""Tests for the batch transform operator (U4), layout sinks (R1/R3/S6/S8),
Bernoulli sample (SA2), and DDL helpers (S5)."""

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.split import bernoulli_sample
from computer_vision_foundations_spark.operators.transform import (
    TRAINING_BATCH_SCHEMA,
    default_transform,
    to_training_batches,
)
from computer_vision_foundations_spark.sources.sinks import (
    cache_for_training,
    dataset_bytes,
    repartition_for,
    to_pandas,
    write_row_grouped_parquet,
)
from computer_vision_foundations_spark.sources.tables import (
    create_database,
    drop_database,
)


@pytest.fixture()
def content_df(spark):
    rows = [
        (f"/img/{i}.jpg", bytes([i % 251] * 64) + b"payload%d" % i, i % 2)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "path string, content binary, label int")


def test_to_training_batches_schema_and_values(content_df):
    out = to_training_batches(content_df.select("content", "label"))
    assert out.schema == TRAINING_BATCH_SCHEMA
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.shape == [len(r.features)]
        assert all(0.0 <= f <= 1.0 for f in r.features)
        assert r.label in (0.0, 1.0)


def test_to_training_batches_deterministic(content_df):
    a = to_training_batches(content_df.select("content", "label")).collect()
    b = to_training_batches(content_df.select("content", "label")).collect()
    key = lambda r: tuple(r.features)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_to_training_batches_custom_fn(content_df):
    import pandas as pd

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": batch["content"].str.len().astype("int64")})

    out = to_training_batches(content_df, transform_fn=fn, schema="n long")
    lens = sorted(r.n for r in out.collect())
    assert len(lens) == 20 and all(n > 64 for n in lens)


def test_default_transform_missing_label():
    import pandas as pd

    batch = pd.DataFrame({"content": [b"abc", b"defg"]})
    out = default_transform(batch)
    assert list(out.columns) == ["features", "shape", "label"]
    assert (out["label"] == 0.0).all()


def test_bernoulli_sample_seeded_and_bounded(spark):
    df = spark.range(10_000)
    s1 = bernoulli_sample(df, 0.1, seed=7)
    s2 = bernoulli_sample(df, 0.1, seed=7)
    ids1 = sorted(r.id for r in s1.collect())
    ids2 = sorted(r.id for r in s2.collect())
    assert ids1 == ids2  # seeded → deterministic
    assert 700 < len(ids1) < 1300  # ~10%


def test_repartition_for(content_df):
    out = repartition_for(content_df, 7)
    assert out.rdd.getNumPartitions() == 7


def test_dataset_bytes(spark):
    df = spark.createDataFrame(
        [("ab", b"1234"), ("c", b"56")], "path string, content binary"
    )
    assert dataset_bytes(df) == 2 + 4 + 1 + 2
    assert dataset_bytes(df.select("path"), ("content",)) == 0


def test_write_row_grouped_parquet_roundtrip(content_df, tmp_path):
    path = str(tmp_path / "cache")
    used = write_row_grouped_parquet(content_df, path, parallelism=4)
    assert used >= 64 * 1024
    back = content_df.sparkSession.read.parquet(path)
    assert back.count() == 20
    assert set(back.columns) == {"path", "content", "label"}


def test_write_row_grouped_parquet_row_group_size(spark, tmp_path):
    # A big frame with a small explicit row-group size must produce
    # multiple row groups inside a single file.
    df = spark.range(50_000).coalesce(1).withColumn(
        "pad", F.repeat(F.lit("x"), 100)
    )
    path = str(tmp_path / "rg")
    write_row_grouped_parquet(df, path, parallelism=1, row_group_bytes=256 * 1024)
    files = [f for f in (tmp_path / "rg").iterdir() if f.suffix == ".parquet"]
    assert files
    assert max(pq.ParquetFile(str(f)).num_row_groups for f in files) > 1


def test_cache_for_training_lifecycle(content_df, tmp_path):
    path = str(tmp_path / "train_cache")
    cache = cache_for_training(content_df, path)
    assert cache.read(content_df.sparkSession).count() == 20
    cache.delete()
    import os

    assert not os.path.exists(path)


def test_to_pandas_limit(content_df):
    pdf = to_pandas(content_df.select("path", "label"), limit=5)
    assert len(pdf) == 5
    assert list(pdf.columns) == ["path", "label"]


def test_create_drop_database(spark, tmp_path):
    name = "cv_test_db"
    create_database(spark, name, location=str(tmp_path / "db"), drop_first=True)
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert name in dbs
    # idempotent
    create_database(spark, name)
    drop_database(spark, name)
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert name not in dbs
