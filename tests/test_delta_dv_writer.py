"""Writer-side deletion vectors + column-mapped create/append
(sources/delta_writer.py, round-10 verdict stretch #7): DV-emitting
DELETE vs copy-on-write identity, DV generation merging, protocol
upgrade, DV-aware MERGE/OPTIMIZE/RESTORE (no resurrection), checkpoint
fidelity for DVs and mapping configuration, and the mapped-table
write gates."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_dvw_")


def _mk(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 2 == 0).cast("string").alias("even"),
    )


def _keys(spark, root, version=None):
    return sorted(
        r["k"] for r in dr.read_delta(spark, root, version=version).collect()
    )


def test_dv_delete_matches_copy_on_write(spark):
    """Same predicate, both modes: identical visible rows; the DV mode
    leaves the data files untouched and upgrades the protocol."""
    cow, dvr = _root(), _root()
    df = _mk(spark)
    dw.delta_create(spark, cow, df, partition_by=["even"])
    dw.delta_create(spark, dvr, df, partition_by=["even"])
    files_before = set(dr.delta_snapshot(dvr, spark).files)
    dw.delta_delete_where(spark, cow, F.col("k") % 5 == 0)
    v = dw.delta_delete_where(spark, dvr, F.col("k") % 5 == 0, use_dvs=True)
    assert _keys(spark, cow) == _keys(spark, dvr)
    snap = dr.delta_snapshot(dvr, spark, version=v)
    assert set(snap.files) == files_before  # no data file rewritten
    assert snap.dvs and all(
        d["storageType"] == "u" for d in snap.dvs.values()
    )
    assert "deletionVectors" in (snap.protocol_raw.get("readerFeatures") or [])
    assert "appendOnly" in (snap.protocol_raw.get("writerFeatures") or [])


def test_dv_delete_merges_generations_and_time_travels(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark))
    v1 = dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True)
    v2 = dw.delta_delete_where(
        spark, root, (F.col("k") >= 5) & (F.col("k") < 8), use_dvs=True
    )
    assert _keys(spark, root, version=v1) == [3, 4] + list(range(5, 20))
    assert _keys(spark, root, version=v2) == [3, 4] + list(range(8, 20))
    snap = dr.delta_snapshot(root, spark)
    # merged DV generations cover both deletes across the table's files
    assert sum(d["cardinality"] for d in snap.dvs.values()) == 6
    # deleting an already-DV-deleted range is a no-op commit-wise
    assert (
        dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True) == v2
    )


def test_dv_delete_drops_fully_deleted_files(spark):
    """A file whose every row is deleted is removed, not given a
    full-coverage DV."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark), partition_by=["even"])
    dw.delta_delete_where(spark, root, F.col("even") == "true", use_dvs=True)
    snap = dr.delta_snapshot(root, spark)
    assert all(pv["even"] == "false" for pv in snap.files.values())
    assert not snap.dvs
    assert _keys(spark, root) == list(range(1, 20, 2))


def test_upsert_on_dv_table_does_not_resurrect(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark))
    dw.delta_delete_where(spark, root, F.col("k") < 5, use_dvs=True)
    ups = spark.createDataFrame(
        [(7, "V7", "false"), (100, "V100", "true")], "k long, v string, even string"
    )
    dw.delta_upsert(spark, root, ups, ["k"])
    got = {r["k"]: r["v"] for r in dr.read_delta(spark, root).collect()}
    assert sorted(got) == list(range(5, 20)) + [100]
    assert got[7] == "V7" and got[100] == "V100"
    # rewrite dropped the DV (rows physically gone from the new file)
    assert not dr.delta_snapshot(root, spark).dvs


def test_cow_delete_on_dv_table_honors_dvs(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark))
    dw.delta_delete_where(spark, root, F.col("k") < 5, use_dvs=True)
    dw.delta_delete_where(spark, root, F.col("k") >= 15)  # copy-on-write
    assert _keys(spark, root) == list(range(5, 15))
    assert not dr.delta_snapshot(root, spark).dvs


def test_optimize_purges_dvs(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 50).repartition(6))
    dw.delta_delete_where(spark, root, F.col("k") % 3 == 0, use_dvs=True)
    before = _keys(spark, root)
    v = dw.delta_optimize(spark, root, target_file_bytes=1 << 20)
    snap = dr.delta_snapshot(root, spark, version=v)
    assert not snap.dvs  # purged: rewritten files carry no DV
    assert _keys(spark, root) == before
    # purge changes NO visible row (the DV'd rows were already
    # logically deleted), so the commit is dataChange=false — the
    # OPTIMIZE / REORG PURGE semantics change-feed readers rely on
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    assert all(
        a.get("add", a.get("remove", {})).get("dataChange") is False
        for a in acts
        if "add" in a or "remove" in a
    )


def test_restore_across_dv_generations(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark))  # v0
    v1 = dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True)
    dw.delta_delete_where(spark, root, F.col("k") < 8, use_dvs=True)  # v2
    v3 = dw.delta_restore(spark, root, v1)
    assert _keys(spark, root, version=v3) == _keys(spark, root, version=v1)
    v4 = dw.delta_restore(spark, root, 0)
    assert _keys(spark, root, version=v4) == list(range(20))
    assert not dr.delta_snapshot(root, spark).dvs


def test_dvs_survive_writer_checkpoint(spark):
    """A checkpoint written AFTER a DV delete must carry the DV
    structs, the feature-bearing protocol, and the configuration."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark))
    dw.delta_delete_where(spark, root, F.col("k") < 4, use_dvs=True)
    for i in range(9):  # versions 2..10; checkpoint fires at 10
        dw.delta_append(
            spark,
            root,
            spark.createDataFrame(
                [(100 + i, f"a{i}", "x")], "k long, v string, even string"
            ),
        )
    snap = dr.delta_snapshot(root, spark)
    assert snap.checkpoint_version == 10
    assert snap.num_commits_replayed == 0
    assert snap.dvs and next(iter(snap.dvs.values()))["cardinality"] == 4
    got = _keys(spark, root)
    assert got == list(range(4, 20)) + list(range(100, 109))


def test_mapped_create_append_read_roundtrip(spark):
    """column_mapping=True: physical names on disk, logical names on
    read; append translates; checkpoint keeps the mapping config."""
    root = _root()
    df = spark.createDataFrame(
        [(1, "a", "EU"), (2, "b", "US")], "id long, name string, region string"
    )
    dw.delta_create(spark, root, df, partition_by=["region"], column_mapping=True)
    snap = dr.delta_snapshot(root, spark)
    assert snap.column_mapping == "name"
    phys = {
        f.name: (f.metadata or {})["delta.columnMapping.physicalName"]
        for f in snap.schema.fields
    }
    assert all(p.startswith("col-") for p in phys.values())
    # hive dirs use the physical partition name
    assert any(
        d.startswith(phys["region"] + "=") for d in os.listdir(root)
        if not d.startswith("_")
    )
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(3, "c", "EU")], "id long, name string, region string"),
    )
    got = dr.read_delta(spark, root)
    assert got.columns == ["id", "name", "region"]
    assert sorted((r["id"], r["region"]) for r in got.collect()) == [
        (1, "EU"), (2, "US"), (3, "EU"),
    ]
    for i in range(9):  # appends v2..v10 trigger the checkpoint at v10
        dw.delta_append(
            spark,
            root,
            spark.createDataFrame(
                [(10 + i, "x", "EU")], "id long, name string, region string"
            ),
        )
    snap2 = dr.delta_snapshot(root, spark)
    assert snap2.checkpoint_version == 10
    assert snap2.column_mapping == "name"
    assert dr.read_delta(spark, root).count() == 12


def test_mapped_rewrite_ops_are_gated(spark):
    root = _root()
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    dw.delta_create(spark, root, df, column_mapping=True)
    for fn in (
        lambda: dw.delta_overwrite(spark, root, df),
        lambda: dw.delta_upsert(spark, root, df, ["id"]),
        lambda: dw.delta_delete_where(spark, root, F.col("id") == 1),
        lambda: dw.delta_optimize(spark, root),
        lambda: dw.delta_append(spark, root, df, merge_schema=True),
    ):
        with pytest.raises(dr.DeltaProtocolError, match="column-mapped"):
            fn()


def test_row_changes_with_dv_granularity(spark):
    """delta_row_changes: DV commits surface exactly the newly-deleted
    row positions, appends their file's rows, RESTORE the resurrected
    rows; OPTIMIZE (dataChange=false) emits nothing."""
    root = _root()
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    dw.delta_create(spark, root, df)  # v0
    dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True)  # v1
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(100, "x"), (101, "y")], "k long, p string"),
    )  # v2
    dw.delta_delete_where(
        spark, root, (F.col("k") >= 5) & (F.col("k") < 7), use_dvs=True
    )  # v3
    ch = dr.delta_row_changes(spark, root, 0, 3)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["k"]) for r in ch.collect()
    )
    assert rows == [
        (1, "delete", 0), (1, "delete", 1), (1, "delete", 2),
        (2, "insert", 100), (2, "insert", 101),
        (3, "delete", 5), (3, "delete", 6),
    ]
    # RESTORE to v0: the DV-deleted rows come back as inserts, the
    # appended file goes as deletes
    v4 = dw.delta_restore(spark, root, 0)
    rows2 = sorted(
        (r["_change_type"], r["k"])
        for r in dr.delta_row_changes(spark, root, 3, v4).collect()
    )
    assert rows2 == [
        ("delete", 100), ("delete", 101),
        ("insert", 0), ("insert", 1), ("insert", 2),
        ("insert", 5), ("insert", 6),
    ]
    # a window with no data-changing commits is empty, schema intact
    empty = dr.delta_row_changes(spark, root, v4 - 1, v4)
    assert empty.count() == 7  # the restore itself
    with pytest.raises(ValueError, match="must be >"):
        dr.delta_row_changes(spark, root, 3, 3)


def test_row_changes_skips_optimize(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 50).repartition(6))
    dw.delta_delete_where(spark, root, F.col("k") % 5 == 0, use_dvs=True)
    v = dw.delta_optimize(spark, root, target_file_bytes=1 << 20)
    assert v == 2
    # the purge compaction changes no visible row (its DV'd rows were
    # already deleted by the DV commit), so the dataChange=false
    # commit emits NOTHING in the feed
    assert dr.delta_row_changes(spark, root, 1, 2).count() == 0
    # a pure-rearrange OPTIMIZE (no DVs) likewise emits NOTHING
    root2 = _root()
    dw.delta_create(spark, root2, _mk(spark, 50).repartition(6))
    v2 = dw.delta_optimize(spark, root2, target_file_bytes=1 << 20)
    assert v2 == 1
    assert dr.delta_row_changes(spark, root2, 0, 1).count() == 0


def test_mapped_nested_ids_unique(spark):
    """Nested-schema mapping ids must be UNIQUE (delta-spark validates
    this on read): the parent field's id is taken before recursing, so
    a struct cannot share an id with its last child (review finding,
    confirmed by execution pre-fix)."""
    root = _root()
    df = spark.createDataFrame(
        [(1, ("x", 9), "a")],
        "a long, s struct<x:string, y:long>, b string",
    )
    dw.delta_create(spark, root, df, column_mapping=True)
    snap = dr.delta_snapshot(root, spark)

    def collect_ids(dt):
        out = []
        for f in getattr(dt, "fields", []):
            meta = f.metadata or {}
            out.append(meta["delta.columnMapping.id"])
            out += collect_ids(f.dataType)
        return out

    ids = collect_ids(snap.schema)
    assert len(ids) == 5 and len(set(ids)) == 5, ids
    got = dr.read_delta(spark, root).collect()
    assert got[0]["s"]["x"] == "x" and got[0]["s"]["y"] == 9


def test_row_changes_refuses_mid_window_schema_change(spark):
    """Round-11 ADVICE (medium): a mergeSchema append inside the CDF
    window changes the read schema mid-range — the feed must refuse
    loudly, not scan new files with the base schema; windows on either
    side of the metaData commit still work."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 6))                        # v0
    dw.delta_append(spark, root, _mk(spark, 3))                        # v1
    dw.delta_append(
        spark, root, _mk(spark, 3).withColumn("extra", F.lit(1)),
        merge_schema=True,
    )                                                                  # v2
    dw.delta_append(
        spark,
        root,
        _mk(spark, 2).withColumn("extra", F.lit(2)),
    )                                                                  # v3
    with pytest.raises(dr.DeltaProtocolError, match="schema-changing"):
        dr.delta_row_changes(spark, root, 0, 3)
    # sub-windows that do not cross the metaData commit are fine
    assert dr.delta_row_changes(spark, root, 0, 1).count() == 3
    assert dr.delta_row_changes(spark, root, 2, 3).count() == 2


def test_row_changes_allows_metadata_reemit(spark):
    """A commit that RE-STATES the identical metaData (checkpoint
    replay / identity-preserving commits) is not a schema change."""
    import urllib.parse

    root = _root()
    dw.delta_create(spark, root, _mk(spark, 6))                        # v0
    dw.delta_append(spark, root, _mk(spark, 3))                        # v1
    # synthesize v2: identical metaData re-emit plus one add
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        meta_line = next(
            line for line in fh if '"metaData"' in line
        ).strip()
    snap = dr.delta_snapshot(root, spark)
    rel = sorted(snap.files)[0]
    with open(os.path.join(root, "_delta_log", f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "T"}}) + "\n")
        fh.write(meta_line + "\n")
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": urllib.parse.quote(rel, safe="/="),
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    feed = dr.delta_row_changes(spark, root, 0, 2)
    assert feed.filter("_commit_version = 1").count() == 3


def test_dv_protocol_upgrade_carries_legacy_implied_features():
    """Round-11 ADVICE: upgrading a legacy v4/v5/v6 writer protocol to
    table features must carry each version's implied features, not the
    fixed version-2 list."""
    from types import SimpleNamespace

    up = dw._dv_protocol_upgrade(
        SimpleNamespace(
            protocol_raw={"minReaderVersion": 2, "minWriterVersion": 6}
        )
    )["protocol"]
    assert up["minReaderVersion"] == 3 and up["minWriterVersion"] == 7
    assert set(up["writerFeatures"]) == {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
        "identityColumns",
        "deletionVectors",
    }
    # legacy reader 2 implies the columnMapping READER feature
    assert set(up["readerFeatures"]) == {"columnMapping", "deletionVectors"}
    # explicit feature lists pass through untouched (plus DVs)
    up2 = dw._dv_protocol_upgrade(
        SimpleNamespace(
            protocol_raw={
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        )
    )["protocol"]
    assert set(up2["writerFeatures"]) == {"timestampNtz", "deletionVectors"}
    assert set(up2["readerFeatures"]) == {"timestampNtz", "deletionVectors"}


def test_vacuum_removes_dv_files_and_restore_refuses(spark):
    """Round-11 ADVICE: vacuum now reclaims unreferenced DELETION
    VECTOR files too, and restore to a generation whose DV was
    vacuumed refuses up front instead of committing a snapshot that
    fails at scan time."""
    import glob

    root = _root()
    # 2 multi-row files so deletes are partial (DVs, not file drops)
    dw.delta_create(spark, root, _mk(spark).repartition(2))
    v1 = dw.delta_delete_where(spark, root, F.col("k") < 3, use_dvs=True)
    dw.delta_delete_where(spark, root, F.col("k") < 8, use_dvs=True)  # v2
    live_dvs = len(dr.delta_snapshot(root, spark).dvs or {})
    on_disk = glob.glob(os.path.join(root, "deletion_vector_*.bin"))
    assert live_dvs >= 1 and len(on_disk) > live_dvs  # v1 gen lingers
    removed = dw.delta_vacuum(root, spark, retain_last=1)
    assert any(r.startswith("deletion_vector_") for r in removed)
    assert (
        len(glob.glob(os.path.join(root, "deletion_vector_*.bin")))
        == live_dvs
    )
    with pytest.raises(FileNotFoundError, match="deletion-vector"):
        dw.delta_restore(spark, root, v1)


def test_executor_side_dv_decode_matches_driver(spark, monkeypatch):
    """Forcing the executor-side mapInPandas decode (threshold 0) must
    produce the exact same visible rows as the driver decode."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 50))
    dw.delta_delete_where(spark, root, F.col("k") % 3 == 0, use_dvs=True)
    want = _keys(spark, root)
    monkeypatch.setattr(dr, "_DV_DRIVER_DECODE_MAX", 0)
    assert _keys(spark, root) == want
    assert want == [k for k in range(50) if k % 3 != 0]


def test_id_mapped_create_refuses_nested(spark):
    root = _root()
    df = _mk(spark, 4).withColumn(
        "nested", F.struct(F.col("k").alias("a"))
    )
    with pytest.raises(dr.DeltaProtocolError, match="nested"):
        dw.delta_create(spark, root, df, column_mapping="id")
