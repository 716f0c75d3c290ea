"""variantType through the Delta adapter: create/append round trip,
feature declaration, mergeSchema upgrade, foreign-feature acceptance,
and the shredding refusal."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_variant_")


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("id").alias("a"),
                    (F.col("id") * 2).alias("b"),
                )
            )
        ).alias("v"),
    )


def test_variant_create_append_roundtrip(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 10))
    dw.delta_append(spark, root, _mk(spark, 10, 15))
    snap = dr.delta_snapshot(root, spark)
    assert snap.schema["v"].dataType.simpleString() == "variant"
    assert "variantType" in (snap.protocol_raw.get("readerFeatures") or [])
    assert "variantType" in (snap.protocol_raw.get("writerFeatures") or [])
    got = dr.read_delta(spark, root).selectExpr(
        "k", "variant_get(v, '$.a', 'long') AS a", "variant_get(v, '$.b', 'long') AS b"
    )
    rows = {r["k"]: (r["a"], r["b"]) for r in got.collect()}
    assert len(rows) == 15 and rows[12] == (12, 24)


def test_variant_mergeschema_upgrades_protocol(spark):
    root = _root()
    dw.delta_create(
        spark, root, spark.createDataFrame([(1,)], "k long")
    )
    assert (dr.delta_snapshot(root, spark).protocol_raw or {}).get(
        "minReaderVersion"
    ) == 1
    dw.delta_append(spark, root, _mk(spark, 5, 8), merge_schema=True)
    snap = dr.delta_snapshot(root, spark)
    assert "variantType" in (snap.protocol_raw.get("readerFeatures") or [])
    got = dr.read_delta(spark, root).selectExpr(
        "k", "variant_get(v, '$.a', 'long') AS a"
    )
    rows = {r["k"]: r["a"] for r in got.collect()}
    assert rows[1] is None and rows[6] == 6  # old rows NULL variant


def test_variant_shredding_still_refused(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 4))
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = fh.read().replace(
            '"variantType"', '"variantShredding"'
        )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(lines)
    with pytest.raises(dr.DeltaProtocolError, match="variantShredding"):
        dr.delta_snapshot(root, spark)
