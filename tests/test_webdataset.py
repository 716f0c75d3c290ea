"""WebDataset tar shard export/ingest (sources/webdataset.py):
round trip, grouping convention, shard assignment stability, and
byte-determinism of a re-export."""

import hashlib
import os
import tarfile

import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset_shards,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (f"img{i:03d}", bytearray(bytes([i]) * (10 + i)), i % 3, f"s{i % 2}")
        for i in range(24)
    ]
    return spark.createDataFrame(
        rows, "key string, content binary, label int, source string"
    )


def test_round_trip(spark, samples, tmp_path):
    out = str(tmp_path / "wds")
    shards = write_webdataset_shards(
        samples, out, meta_cols=["label", "source"], n_shards=4
    )
    assert 1 <= len(shards) <= 4
    back = read_webdataset(spark, out).collect()
    assert len(back) == 24
    by_key = {r["key"]: r for r in back}
    src = {r["key"]: r for r in samples.collect()}
    for k, r in by_key.items():
        assert bytes(r["content"]) == bytes(src[k]["content"])
        import json

        meta = json.loads(r["meta"])
        assert meta["label"] == src[k]["label"]
        assert meta["source"] == src[k]["source"]


def test_member_layout_and_determinism(samples, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = write_webdataset_shards(samples, out1, n_shards=2)
    s2 = write_webdataset_shards(samples, out2, n_shards=2)
    assert [os.path.basename(p) for p in s1] == [
        os.path.basename(p) for p in s2
    ]
    # byte-identical re-export: zeroed timestamps + key-sorted members
    for a, b in zip(s1, s2):
        ha = hashlib.md5(open(a, "rb").read()).hexdigest()
        hb = hashlib.md5(open(b, "rb").read()).hexdigest()
        assert ha == hb
    with tarfile.open(s1[0]) as tf:
        names = tf.getnames()
    stems = [n.rsplit(".", 1)[0] for n in names]
    # each sample contributes exactly (.png, .json), adjacent, sorted
    assert stems == sorted(stems)
    assert all(
        names[i].endswith(".json") or names[i + 1].endswith(".json")
        for i in range(0, len(names) - 1, 2)
    )


def test_incomplete_samples_dropped(spark, tmp_path):
    out = str(tmp_path / "wds")
    os.makedirs(out, exist_ok=True)
    import io

    from computer_vision_foundations_spark.sources.webdataset import (
        _tarinfo,
    )

    with tarfile.open(os.path.join(out, "shard-00000.tar"), "w") as tf:
        tf.addfile(_tarinfo("good.png", 3), io.BytesIO(b"abc"))
        tf.addfile(_tarinfo("good.json", 2), io.BytesIO(b"{}"))
        tf.addfile(_tarinfo("orphan.png", 3), io.BytesIO(b"xyz"))
    rows = read_webdataset(spark, out).collect()
    assert [r["key"] for r in rows] == ["good"]
