"""Row tracking: stable row ids across appends, copy-on-write
DELETE/MERGE, OPTIMIZE/ZORDER, DV deletes, RESTORE, checkpoints and
shallow clones."""

import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_rt_")


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _ids(spark, root):
    return {
        r["k"]: r["_row_id"]
        for r in dr.read_delta(spark, root, with_row_ids=True).collect()
    }


def test_enable_and_read_ids(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 100).repartition(4))
    dw.delta_enable_row_tracking(spark, root)
    ids = _ids(spark, root)
    assert len(ids) == 100
    assert len(set(ids.values())) == 100  # distinct
    assert ids == _ids(spark, root)  # stable across reads
    proto = dr.delta_snapshot(root, spark).protocol_raw
    assert "rowTracking" in proto["writerFeatures"]
    assert proto["minReaderVersion"] == 1  # writer-only


def test_append_extends_monotonically(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 50))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    dw.delta_append(spark, root, _mk(spark, 50, 80))
    after = _ids(spark, root)
    assert {k: v for k, v in after.items() if k < 50} == before
    new_ids = {v for k, v in after.items() if k >= 50}
    assert new_ids and min(new_ids) > max(before.values())
    assert len(set(after.values())) == 80


def test_ids_stable_across_optimize_and_zorder(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 500).repartition(8))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    dw.delta_optimize(spark, root, target_file_bytes=1024 * 1024)
    assert _ids(spark, root) == before
    dw.delta_optimize(spark, root, target_file_bytes=8 * 1024, zorder_by=["k", "v"])
    assert _ids(spark, root) == before


def test_ids_stable_across_cow_delete(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 200).repartition(2))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    dw.delta_delete_where(spark, root, F.col("k") % 3 == 0)
    after = _ids(spark, root)
    assert after == {k: v for k, v in before.items() if k % 3 != 0}


def test_ids_stable_across_dv_delete(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 200).repartition(2))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    dw.delta_delete_where(spark, root, F.col("k") % 3 == 0, use_dvs=True)
    after = _ids(spark, root)
    assert after == {k: v for k, v in before.items() if k % 3 != 0}


def test_upsert_keeps_updated_ids_and_mints_new(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 100))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    updates = spark.range(90, 110).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    dw.delta_upsert(spark, root, updates, ["k"])
    after = _ids(spark, root)
    got = dr.read_delta(spark, root).filter("v = -1").count()
    assert got == 20
    # updated rows (90..99) keep their ids
    for k in range(90, 100):
        assert after[k] == before[k], k
    # untouched rows keep theirs
    for k in range(0, 50):
        assert after[k] == before[k], k
    # inserted rows (100..109) get fresh distinct ids
    fresh = {after[k] for k in range(100, 110)}
    assert len(fresh) == 10 and fresh.isdisjoint(set(before.values()))


def test_ids_survive_checkpoint(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 60), checkpoint_every=2)
    dw.delta_enable_row_tracking(spark, root, checkpoint_every=2)
    before = _ids(spark, root)
    for i in range(3):
        dw.delta_append(
            spark, root, _mk(spark, 60 + i * 5, 65 + i * 5), checkpoint_every=2
        )
    snap = dr.delta_snapshot(root, spark)
    assert snap.checkpoint_version is not None
    after = _ids(spark, root)
    assert {k: v for k, v in after.items() if k < 60} == before
    assert len(set(after.values())) == 75


def test_restore_restores_ids(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 50))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    v0 = dr.delta_snapshot(root, spark).version
    dw.delta_delete_where(spark, root, F.col("k") < 25)
    dw.delta_restore(spark, root, v0)
    assert _ids(spark, root) == before


def test_clone_carries_ids(spark):
    root = _root()
    tgt = tempfile.mkdtemp(prefix="delta_rt_tgt_") + "/t"
    dw.delta_create(spark, root, _mk(spark, 0, 50))
    dw.delta_enable_row_tracking(spark, root)
    before = _ids(spark, root)
    dw.delta_clone(spark, root, tgt)
    assert _ids(spark, tgt) == before
    # and the clone's own appends continue above the inherited hwm
    dw.delta_append(spark, tgt, _mk(spark, 50, 60))
    after = _ids(spark, tgt)
    assert min(after[k] for k in range(50, 60)) > max(before.values())


def test_with_row_ids_requires_enablement(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 5))
    with pytest.raises(ValueError, match="row tracking"):
        dr.read_delta(spark, root, with_row_ids=True)
