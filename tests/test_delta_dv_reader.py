"""Deletion-vector + columnMapping=name READ support
(sources/delta_reader.py, round-11 verdict asks #2/#3) against the
committed real-format fixtures built by tools/make_delta_dv_fixture.py:
DV resolution through JSON commits AND a DV-bearing checkpoint,
(path, dv uniqueId) add/remove reconciliation, on-disk multi-DV files
at offsets, inline DVs, time travel across DV generations, physical
column-name resolution (nested struct + partition column), and a
logical rename that leaves the parquet files untouched."""

import os

import pytest

from computer_vision_foundations_spark.sources import delta_reader as dr

DV_ROOT = os.path.join(
    os.path.dirname(__file__), "fixtures", "delta_dv_sales"
)
MAP_ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "delta_mapped")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_dv_snapshot_state():
    """f0 carries the v2 DV generation, f1 the inline DV, f2/f3 none;
    the stale v1 generation was reconciled away by (path, dv id)."""
    snap = dr.delta_snapshot(DV_ROOT, None)
    assert sorted(snap.files) == [
        "part=EU/f0.parquet",
        "part=EU/f1.parquet",
        "part=US/f2.parquet",
        "part=US/f3.parquet",
    ]
    assert set(snap.dvs) == {"part=EU/f0.parquet", "part=EU/f1.parquet"}
    assert snap.dvs["part=EU/f0.parquet"]["cardinality"] == 4
    assert snap.dvs["part=EU/f1.parquet"]["storageType"] == "i"


def test_dv_read_latest(spark):
    """Deleted row indexes {1,3,5,7} of f0 and {0} of f1 vanish."""
    got = _ids(dr.read_delta(spark, DV_ROOT))
    assert got == [0, 2, 4, 6, 8, 9, 11, 12, 13, 14] + list(
        range(20, 26)
    ) + [30, 31, 32]


def test_dv_time_travel(spark):
    """v0: nothing deleted. v1: only f0's first DV generation {1,3}.
    v2: both DVs live, f3 not yet added."""
    assert _ids(dr.read_delta(spark, DV_ROOT, version=0)) == list(
        range(10)
    ) + list(range(10, 15)) + list(range(20, 26))
    assert _ids(dr.read_delta(spark, DV_ROOT, version=1)) == [
        0, 2, 4, 5, 6, 7, 8, 9,
    ] + list(range(10, 15)) + list(range(20, 26))
    assert _ids(dr.read_delta(spark, DV_ROOT, version=2)) == [
        0, 2, 4, 6, 8, 9,
    ] + list(range(11, 15)) + list(range(20, 26))


def test_dv_survives_checkpoint_resolution(spark):
    """The v3 snapshot resolves from the v2 checkpoint (+1 commit);
    the DV descriptors must come through the checkpoint's add structs,
    not only the JSON replay."""
    snap = dr.delta_snapshot(DV_ROOT, None, version=3)
    assert snap.checkpoint_version == 2
    assert snap.num_commits_replayed == 1
    assert set(snap.dvs) == {"part=EU/f0.parquet", "part=EU/f1.parquet"}
    got = _ids(dr.read_delta(spark, DV_ROOT, version=3))
    assert 1 not in got and 10 not in got and 30 in got


def test_dv_partition_pruning_preserved(spark):
    """The DV anti-join must not break partition pruning: a filter on
    the partition column still prunes to that partition's files."""
    df = dr.read_delta(spark, DV_ROOT).filter("part = 'US'")
    assert _ids(df) == list(range(20, 26)) + [30, 31, 32]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the scan as a PartitionFilter (file-level
    # pruning), not a post-scan Filter above the DV anti-join
    assert "PartitionFilters: [isnotnull(part" in plan
    assert "part#" in plan and "= US)" in plan


def test_mapped_snapshot_and_read(spark):
    """Physical parquet names (col-a1...) resolve to logical columns,
    including the nested struct fields and the partition column; the
    inline DV on m1 drops physical row 1 (id 11)."""
    snap = dr.delta_snapshot(MAP_ROOT, None)
    assert snap.column_mapping == "name"
    assert [f.name for f in snap.schema.fields] == [
        "id", "title", "details", "region",
    ]
    df = dr.read_delta(spark, MAP_ROOT)
    assert df.columns == ["id", "title", "details", "region"]
    assert df.schema["details"].dataType.fieldNames() == ["city", "zip"]
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 10, 12, 13]  # 11 DV-deleted
    assert rows[0]["title"] == "n0"
    assert rows[0]["details"]["city"] == "c0" and rows[0]["details"]["zip"] == 1000
    assert rows[0]["region"] == "EU" and rows[10]["region"] == "US"


def test_mapped_rename_time_travel(spark):
    """v0 exposes the pre-rename logical name 'name'; the data files
    are identical (rename was metadata-only)."""
    v0 = dr.read_delta(spark, MAP_ROOT, version=0)
    assert v0.columns == ["id", "name", "details", "region"]
    assert sorted(r["id"] for r in v0.collect()) == [
        0, 1, 2, 3, 4, 10, 11, 12, 13,
    ]


def test_mapped_partition_filter(spark):
    got = dr.read_delta(spark, MAP_ROOT).filter("region = 'EU'")
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3, 4]


def test_column_mapping_id_roundtrip(spark, tmp_path):
    """columnMapping=id write→read round trip (round-11 verdict ask
    #3): create writes parquet FIELD IDS (verified in the footer),
    read resolves by them."""
    import glob

    import pyarrow.parquet as pq

    from computer_vision_foundations_spark.sources import delta_writer as dw

    root = str(tmp_path / "idmode")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(20)],
        "id int, name string, score double",
    )
    dw.delta_create(spark, root, df, column_mapping="id")
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(100, "x", 9.0)], "id int, name string, score double"),
    )
    snap = dr.delta_snapshot(root, spark)
    assert snap.column_mapping == "id"
    # every data file must carry field ids (the id-mode contract)
    for f in glob.glob(os.path.join(root, "*.parquet")):
        s = pq.ParquetFile(f).schema
        assert all(
            s.column(i).name and "field_id=" in str(s).split("\n")[i + 1]
            for i in range(len(s.names))
        ), str(s)
    got = dr.read_delta(spark, root)
    assert got.columns == ["id", "name", "score"]
    rows = {r["id"]: (r["name"], r["score"]) for r in got.collect()}
    assert len(rows) == 21
    assert rows[3] == ("n3", 4.5) and rows[100] == ("x", 9.0)


def test_column_mapping_id_resolves_by_id_not_name(spark, tmp_path):
    """The proof that mode 'id' resolution is BY FIELD ID: rewrite a
    data file with SCRAMBLED column names (field ids preserved) — a
    name-based reader would see nulls/garbage; the id reader must
    return identical rows."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from computer_vision_foundations_spark.sources import delta_writer as dw

    root = str(tmp_path / "idscram")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(10)],
        "id int, name string, score double",
    )
    dw.delta_create(spark, root, df, column_mapping="id")
    before = {
        r["id"]: (r["name"], r["score"])
        for r in dr.read_delta(spark, root).collect()
    }
    for f in glob.glob(os.path.join(root, "*.parquet")):
        tbl = pq.read_table(f)
        fields = []
        for i, fld in enumerate(tbl.schema):
            fid = fld.metadata[b"PARQUET:field_id"]
            fields.append(
                pa.field(
                    f"scrambled_{i}",
                    fld.type,
                    fld.nullable,
                    {b"PARQUET:field_id": fid},
                )
            )
        scrambled = pa.Table.from_arrays(
            [tbl.column(i) for i in range(tbl.num_columns)],
            schema=pa.schema(fields),
        )
        pq.write_table(scrambled, f)
    after = {
        r["id"]: (r["name"], r["score"])
        for r in dr.read_delta(spark, root).collect()
    }
    assert after == before and len(after) == 10


def test_dv_history_counts():
    hist = dr.delta_history(DV_ROOT)
    assert [h["version"] for h in hist] == [0, 1, 2, 3]
    assert hist[1]["n_adds"] == 1 and hist[1]["n_removes"] == 1
    assert hist[2]["n_adds"] == 2 and hist[2]["n_removes"] == 2


V2_ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "delta_v2ckpt")


def test_v2_checkpoint_resolution(spark):
    """Snapshot at the tip resolves FROM the V2 checkpoint (UUID-named
    json top-level + parquet sidecars, PROTOCOL.md "V2 Checkpoints"):
    one commit replayed, the sidecar adds folded — including the
    DV-bearing one — and the post-checkpoint append visible."""
    snap = dr.delta_snapshot(V2_ROOT, None)
    assert snap.checkpoint_version == 1
    assert snap.num_commits_replayed == 1
    assert sorted(snap.files) == ["s0.parquet", "s1.parquet", "s2.parquet"]
    assert set(snap.dvs) == {"s1.parquet"}  # via the sidecar
    got = sorted(r["id"] for r in dr.read_delta(spark, V2_ROOT).collect())
    # id 12 is DV-deleted (row index 2 of s1)
    assert got == [0, 1, 2, 3, 4, 10, 11, 13, 14, 20, 21, 22]


def test_v2_checkpoint_time_travel_before_checkpoint(spark):
    """Versions BEFORE the checkpoint still resolve by raw replay."""
    got = sorted(r["id"] for r in dr.read_delta(spark, V2_ROOT, version=0).collect())
    assert got == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14]
