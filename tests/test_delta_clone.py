"""SHALLOW CLONE: zero-copy snapshot, full independence afterwards,
DV translation, vacuum safety, stats carry-through."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw
from computer_vision_foundations_spark.sources import skipping


def _roots():
    return (
        tempfile.mkdtemp(prefix="clone_src_"),
        tempfile.mkdtemp(prefix="clone_tgt_") + "/t",
    )


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )


def test_clone_reads_equal_and_zero_copy(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 100).repartition(4))
    dw.delta_clone(spark, src, tgt)
    got = sorted(r["k"] for r in dr.read_delta(spark, tgt).collect())
    assert got == list(range(100))
    # zero data bytes under the clone root
    data_files = [
        f
        for dirpath, _d, files in os.walk(tgt)
        for f in files
        if f.endswith(".parquet") and "_delta_log" not in dirpath
    ]
    assert data_files == []
    # fresh table identity, same schema
    s_src = dr.delta_snapshot(src, spark)
    s_tgt = dr.delta_snapshot(tgt, spark)
    assert s_src.meta_id != s_tgt.meta_id
    assert s_src.schema == s_tgt.schema


def test_clone_is_independent(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 50))
    dw.delta_clone(spark, src, tgt)
    dw.delta_append(spark, tgt, _mk(spark, 50, 60))
    dw.delta_delete_where(spark, tgt, F.col("k") < 10)
    assert dr.read_delta(spark, src).count() == 50  # source untouched
    got = sorted(r["k"] for r in dr.read_delta(spark, tgt).collect())
    assert got == list(range(10, 60))
    # the delete rewrote the touched source file LOCALLY
    local = [
        f
        for dirpath, _d, files in os.walk(tgt)
        for f in files
        if f.endswith(".parquet") and "_delta_log" not in dirpath
    ]
    assert local  # rewritten + appended files live under the clone


def test_clone_partitioned_and_stats(spark):
    src, tgt = _roots()
    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("p"),
        F.col("id").alias("k"),
    )
    dw.delta_create(spark, src, df, partition_by=["p"])
    dw.delta_clone(spark, src, tgt)
    got = dr.read_delta(spark, tgt, where="p = '1' AND k < 100")
    assert sorted(r["k"] for r in got.collect()) == [
        k for k in range(100) if k % 3 == 1
    ]
    snap = dr.delta_snapshot(tgt, spark)
    # stats carried -> skipping works on the clone from commit 0
    assert all((snap.stats or {}).get(rel) for rel in snap.files)
    kept = skipping.matching_files(snap, "p = '1'")
    assert 0 < len(kept) < len(snap.files)


def test_clone_translates_deletion_vectors(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 100).repartition(2))
    dw.delta_delete_where(spark, src, F.col("k") % 4 == 0, use_dvs=True)
    dw.delta_clone(spark, src, tgt)
    snap = dr.delta_snapshot(tgt, spark)
    assert snap.dvs and all(
        d["storageType"] in ("p", "i") for d in snap.dvs.values()
    )
    got = sorted(r["k"] for r in dr.read_delta(spark, tgt).collect())
    assert got == [k for k in range(100) if k % 4 != 0]
    # DV-deleting MORE rows on the clone reads through the source DV
    # (absolute path) and writes the new DV under the clone root
    dw.delta_delete_where(spark, tgt, F.col("k") % 4 == 1, use_dvs=True)
    got = sorted(r["k"] for r in dr.read_delta(spark, tgt).collect())
    assert got == [k for k in range(100) if k % 4 not in (0, 1)]
    assert dr.read_delta(spark, src).count() == 75  # source unchanged


def test_vacuum_on_clone_never_touches_source(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 50))
    dw.delta_clone(spark, src, tgt)
    # churn the clone so old source references leave its live set
    dw.delta_overwrite(spark, tgt, _mk(spark, 100, 110))
    removed = dw.delta_vacuum(tgt, spark, retain_last=1)
    assert all(not r.startswith("/") for r in removed)  # only local names
    assert dr.read_delta(spark, src).count() == 50  # source files intact
    assert dr.read_delta(spark, tgt).count() == 10


def test_clone_time_travel_version(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 10))
    dw.delta_append(spark, src, _mk(spark, 10, 20))
    dw.delta_clone(spark, src, tgt, version=0)
    assert dr.read_delta(spark, tgt).count() == 10


def test_clone_onto_existing_table_refused(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 0, 5))
    dw.delta_clone(spark, src, tgt)
    with pytest.raises(ValueError, match="already a Delta table"):
        dw.delta_clone(spark, src, tgt)


def test_clone_carries_constraints(spark):
    src, tgt = _roots()
    dw.delta_create(spark, src, _mk(spark, 1, 50))
    dw.delta_add_constraint(spark, src, "k_pos", "k > 0")
    dw.delta_clone(spark, src, tgt)
    with pytest.raises(dw.DeltaConstraintViolation, match="k_pos"):
        dw.delta_append(spark, tgt, _mk(spark, -5, 0))
    assert dr.read_delta(spark, tgt).count() == 49
