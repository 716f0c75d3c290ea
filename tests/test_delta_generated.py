"""Generated columns: computed when the input omits them, null-safe
equality enforced when it provides them — including on foreign tables
whose metadata some other writer annotated."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_gen_")


def _mk(spark, lo, hi, with_gen=False):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 86_400_000_000 + 1_600_000_000_000_000).alias("ts"),
    )
    if with_gen:
        df = df.withColumn("event_date", F.col("ts").cast("date"))
    return df


def test_create_computes_generated_partition(spark):
    root = _root()
    dw.delta_create(
        spark,
        root,
        _mk(spark, 0, 10),
        partition_by=["event_date"],
        generated={"event_date": "CAST(ts AS DATE)"},
    )
    snap = dr.delta_snapshot(root, spark)
    assert snap.protocol_raw["minWriterVersion"] == 4
    assert (
        snap.schema["event_date"].metadata["delta.generationExpression"]
        == "CAST(ts AS DATE)"
    )
    got = dr.read_delta(spark, root)
    assert got.filter("event_date <> CAST(ts AS DATE)").count() == 0
    assert got.count() == 10


def test_append_computes_when_omitted(spark):
    root = _root()
    dw.delta_create(
        spark, root, _mk(spark, 0, 5), generated={"event_date": "CAST(ts AS DATE)"}
    )
    dw.delta_append(spark, root, _mk(spark, 5, 8))  # no event_date supplied
    got = dr.read_delta(spark, root)
    assert got.count() == 8
    assert got.filter("event_date IS NULL").count() == 0
    assert got.filter("event_date <> CAST(ts AS DATE)").count() == 0


def test_append_enforces_when_provided(spark):
    root = _root()
    dw.delta_create(
        spark, root, _mk(spark, 0, 5), generated={"event_date": "CAST(ts AS DATE)"}
    )
    dw.delta_append(spark, root, _mk(spark, 5, 8, with_gen=True))  # correct
    bad = _mk(spark, 8, 10).withColumn(
        "event_date", F.lit("1999-01-01").cast("date")
    )
    with pytest.raises(dw.DeltaConstraintViolation, match="generated"):
        dw.delta_append(spark, root, bad)
    assert dr.read_delta(spark, root).count() == 8


def test_upsert_computes_and_enforces(spark):
    root = _root()
    dw.delta_create(
        spark, root, _mk(spark, 0, 5), generated={"event_date": "CAST(ts AS DATE)"}
    )
    dw.delta_upsert(spark, root, _mk(spark, 3, 6), ["k"])  # computed
    got = dr.read_delta(spark, root)
    assert got.count() == 6
    assert got.filter("event_date <> CAST(ts AS DATE)").count() == 0


def test_foreign_generated_annotation_respected(spark):
    """A generation expression recorded by another writer is computed
    and enforced, not refused (the round-12 upgrade from refusal)."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 3, with_gen=True))
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    for a in lines:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            for f in sch["fields"]:
                if f["name"] == "event_date":
                    f["metadata"] = {
                        "delta.generationExpression": "CAST(ts AS DATE)"
                    }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    dw.delta_append(spark, root, _mk(spark, 3, 6))  # computed, no refusal
    assert dr.read_delta(spark, root).count() == 6
    # overwrite would DROP the expression -> still refused
    with pytest.raises(dr.DeltaProtocolError, match="generation"):
        dw.delta_overwrite(spark, root, _mk(spark, 0, 2, with_gen=True))


def test_generated_plus_mapping_refused(spark):
    with pytest.raises(ValueError, match="column mapping"):
        dw.delta_create(
            spark,
            _root(),
            _mk(spark, 0, 3),
            column_mapping=True,
            generated={"event_date": "CAST(ts AS DATE)"},
        )
