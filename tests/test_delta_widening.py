"""Type widening (delta_writer.delta_widen_type + reader acceptance of
the typeWidening feature): metadata-only commits, native parquet
widened reads of pre-widen files, disallowed-change refusal, protocol
upgrade, and time travel to the narrow schema."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_widen_")


def test_widen_int_to_long_roundtrip(spark):
    root = _root()
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k int, p float"
    )
    files_before = None
    dw.delta_create(spark, root, df)
    files_before = set(dr.delta_snapshot(root, spark).files)
    v1 = dw.delta_widen_type(spark, root, "k", "long")
    v2 = dw.delta_widen_type(spark, root, "p", T.DoubleType())
    assert (v1, v2) == (1, 2)
    snap = dr.delta_snapshot(root, spark)
    # metadata-only: same data files, widened schema, feature on
    assert set(snap.files) == files_before
    assert dict(
        (f.name, f.dataType.simpleString()) for f in snap.schema.fields
    ) == {"k": "bigint", "p": "double"}
    assert "typeWidening" in (snap.protocol_raw.get("readerFeatures") or [])
    assert "typeWidening" in (snap.protocol_raw.get("writerFeatures") or [])
    # typeChanges recorded for foreign readers
    ks = next(f for f in snap.schema.fields if f.name == "k")
    assert ks.metadata["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    # append WIDE values beyond int range; narrow files upcast natively
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(2**40, 1.5)], "k long, p double"),
    )
    got = dr.read_delta(spark, root)
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint",
        "double",
    ]
    ks = sorted(r["k"] for r in got.collect())
    assert ks == [0, 1, 2, 3, 4, 5, 2**40]
    # time travel to the narrow schema still works
    v0 = dr.read_delta(spark, root, version=0)
    assert [f.dataType.simpleString() for f in v0.schema.fields] == [
        "int",
        "float",
    ]


def test_widen_refuses_lossy_and_unknown(spark):
    root = _root()
    dw.delta_create(
        spark, root, spark.createDataFrame([(1, "a")], "k long, s string")
    )
    with pytest.raises(ValueError, match="not an allowed type widening"):
        dw.delta_widen_type(spark, root, "k", "int")  # narrowing
    with pytest.raises(ValueError, match="not an allowed type widening"):
        dw.delta_widen_type(spark, root, "s", "long")
    with pytest.raises(ValueError, match="no column"):
        dw.delta_widen_type(spark, root, "zz", "long")


def test_widen_decimal_rule(spark):
    root = _root()
    dw.delta_create(
        spark,
        root,
        spark.createDataFrame([(1,)], "k int").select(
            F.col("k").cast("decimal(5,2)").alias("d")
        ),
    )
    dw.delta_widen_type(spark, root, "d", "decimal(10,4)")
    snap = dr.delta_snapshot(root, spark)
    assert snap.schema.fields[0].dataType.simpleString() == "decimal(10,4)"
    with pytest.raises(ValueError, match="not an allowed"):
        dw.delta_widen_type(spark, root, "d", "decimal(10,2)")  # loses digits


def test_foreign_typewidening_feature_accepted(spark):
    """A table declaring the typeWidening reader feature (as a foreign
    writer would after widening) must read, not refuse."""
    import json

    root = _root()
    dw.delta_create(
        spark, root, spark.createDataFrame([(1,), (2,)], "k int")
    )
    dw.delta_widen_type(spark, root, "k", "long")
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json")) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert sorted(r["k"] for r in dr.read_delta(spark, root).collect()) == [
        1,
        2,
    ]
