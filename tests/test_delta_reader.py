"""Read-only Delta Lake protocol adapter (sources/delta_reader.py)
against the committed REAL-format fixture (tests/fixtures/delta_people,
generated once by tools/make_delta_fixture.py per delta.io PROTOCOL.md).

The fixture's history:
  v0 create  (EU: ada,bo | US: cy)
  v1 append  (EU: dee,eve)
  v2 overwrite of US (remove cy's file; add cy2,dan) + parquet checkpoint
  v3 append  (EU: fay)
"""

import json
import os
import shutil

import pytest

from computer_vision_foundations_spark.sources import acid, delta_reader

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "delta_people"
)
T0 = 1700000000000  # ms; commit v is at T0 + v*60_000


def _names(df):
    return sorted(r["name"] for r in df.collect())


def test_is_delta_table(tmp_path):
    assert delta_reader.is_delta_table(FIXTURE)
    assert not delta_reader.is_delta_table(str(tmp_path))
    # a _delta_log dir with no commits is not a table
    os.makedirs(tmp_path / "_delta_log")
    assert not delta_reader.is_delta_table(str(tmp_path))


def test_read_latest_snapshot(spark):
    df = delta_reader.read_delta(spark, FIXTURE)
    assert [f.name for f in df.schema.fields] == ["id", "name", "score", "region"]
    assert df.schema["region"].dataType.typeName() == "string"
    assert _names(df) == ["ada", "bo", "cy2", "dan", "dee", "eve", "fay"]
    # partition column is recovered from the hive layout, not the files
    eu = df.where("region = 'EU'")
    assert _names(eu) == ["ada", "bo", "dee", "eve", "fay"]


def test_time_travel_by_version(spark):
    assert _names(delta_reader.read_delta(spark, FIXTURE, version=0)) == [
        "ada", "bo", "cy",
    ]
    assert _names(delta_reader.read_delta(spark, FIXTURE, version=1)) == [
        "ada", "bo", "cy", "dee", "eve",
    ]
    # v2 replaced the US file: cy gone, cy2+dan in
    assert _names(delta_reader.read_delta(spark, FIXTURE, version=2)) == [
        "ada", "bo", "cy2", "dan", "dee", "eve",
    ]


def test_time_travel_by_timestamp(spark):
    # between v1 and v2 -> resolves to v1 (commitInfo timestamps)
    ts = (T0 + 90_000) / 1000.0
    assert _names(delta_reader.read_delta(spark, FIXTURE, as_of_ts=ts)) == [
        "ada", "bo", "cy", "dee", "eve",
    ]
    with pytest.raises(ValueError, match="no commit at or before"):
        delta_reader.read_delta(spark, FIXTURE, as_of_ts=(T0 - 1000) / 1000.0)


def test_checkpoint_is_used(spark):
    """Reading v3 must start from the v2 parquet checkpoint and replay
    only commit 3 — and still agree with a full-log replay."""
    snap = delta_reader.delta_snapshot(FIXTURE, spark, version=3)
    assert snap.checkpoint_version == 2
    assert snap.num_commits_replayed == 1
    # same snapshot with the checkpoint hidden (full JSON replay)
    import tempfile

    alt = tempfile.mkdtemp(prefix="delta_nockpt_")
    try:
        shutil.copytree(FIXTURE, alt, dirs_exist_ok=True)
        log = os.path.join(alt, "_delta_log")
        for f in os.listdir(log):
            if "checkpoint" in f or f == "_last_checkpoint":
                os.remove(os.path.join(log, f))
        full = delta_reader.delta_snapshot(alt, spark, version=3)
        assert full.checkpoint_version is None
        assert full.files == snap.files
    finally:
        shutil.rmtree(alt, ignore_errors=True)


def test_bad_version_rejected(spark):
    with pytest.raises(ValueError, match="not in log"):
        delta_reader.delta_snapshot(FIXTURE, spark, version=99)


def test_acid_read_table_routes_to_delta(spark):
    """acid.read_table opens a real Delta table transparently — the
    migration seam the README documents."""
    df = acid.read_table(spark, FIXTURE, version=0)
    assert _names(df) == ["ada", "bo", "cy"]
    latest = acid.read_table(spark, FIXTURE)
    assert latest.count() == 7


def test_history(spark):
    hist = delta_reader.delta_history(FIXTURE)
    assert [h["version"] for h in hist] == [0, 1, 2, 3]
    assert hist[0]["operation"] == "WRITE"
    assert hist[2]["operation"] == "OVERWRITE"
    assert hist[2]["n_removes"] == 1
    assert all(h["timestamp_ms"] == T0 + h["version"] * 60_000 for h in hist)


def _write_protocol_table(tmp_path, protocol_action):
    """Minimal 1-commit unpartitioned table with a custom protocol."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array([1], pa.int64())}),
        os.path.join(root, "part-0.parquet"),
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    actions = [
        {"commitInfo": {"timestamp": T0, "operation": "WRITE"}},
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet"},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {"protocol": protocol_action},
        {
            "add": {
                "path": "part-0.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": T0,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return root


def test_unsupported_reader_features_refused(spark, tmp_path):
    # typeWidening and variantType are SUPPORTED as of round 12; the
    # refusal gate must still fire on genuinely unimplemented reader
    # features (variantShredding = shredded typed_value layouts)
    root = _write_protocol_table(
        tmp_path,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["variantShredding"],
            "writerFeatures": ["variantShredding"],
        },
    )
    with pytest.raises(
        delta_reader.DeltaProtocolError, match="variantShredding"
    ):
        delta_reader.read_delta(spark, root)


def test_dv_feature_without_dvs_reads(spark, tmp_path):
    """deletionVectors is a SUPPORTED reader feature as of round 11:
    a table declaring it whose live adds carry no DV reads normally."""
    root = _write_protocol_table(
        tmp_path,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        },
    )
    assert delta_reader.read_delta(spark, root).count() == 1


def test_supported_reader_feature_accepted(spark, tmp_path):
    root = _write_protocol_table(
        tmp_path,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz"],
            "writerFeatures": ["timestampNtz"],
        },
    )
    assert delta_reader.read_delta(spark, root).count() == 1


def test_reader_v1_and_empty_snapshot(spark, tmp_path):
    root = _write_protocol_table(
        tmp_path, {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    assert delta_reader.read_delta(spark, root).count() == 1
    # v1: remove the only file -> empty frame, committed schema kept
    rm = [
        {"commitInfo": {"timestamp": T0 + 60_000, "operation": "DELETE"}},
        {
            "remove": {
                "path": "part-0.parquet",
                "deletionTimestamp": T0 + 60_000,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in rm) + "\n")
    empty = delta_reader.read_delta(spark, root)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id"]


def test_open_checkpoint_part_handles_uris(spark, tmp_path):
    """Checkpoint parts open through a filesystem-aware path: bare
    local paths and file:// URIs both work (round-10 ADVICE — the
    direct pyarrow open must not regress non-local portability; the
    URI branch routes through pyarrow.fs)."""
    import pathlib

    from computer_vision_foundations_spark.sources.delta_reader import (
        _open_checkpoint_part,
    )

    p = str(tmp_path / "part.parquet")
    spark.createDataFrame([(1,)], "x long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "d"))
    import glob as _g
    import shutil as _sh

    _sh.copy(_g.glob(str(tmp_path / "d" / "*.parquet"))[0], p)
    assert _open_checkpoint_part(p).metadata.num_rows == 1
    uri = pathlib.Path(p).as_uri()
    assert uri.startswith("file://")
    assert _open_checkpoint_part(uri).metadata.num_rows == 1
