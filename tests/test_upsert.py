"""foreachBatch keyed-upsert sink: exactly-once table contents under
re-delivered keys and checkpointed restarts."""

import json
import os

from computer_vision_foundations_spark.streaming.upsert import upsert_stream

SCHEMA = "k LONG, v STRING, day STRING"


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).json(src)


def test_insert_only_dedups_across_batches(spark, tmp_path):
    tmp = str(tmp_path)
    src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    _write_jsonl(
        os.path.join(src, "a.json"),
        [
            {"k": 1, "v": "one", "day": "d1"},
            {"k": 2, "v": "two", "day": "d1"},
            {"k": 2, "v": "two-dup", "day": "d1"},  # in-batch dup
        ],
    )
    upsert_stream(_stream(spark, src), out, ckpt, key_cols=["k"])
    got = {r.k for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}

    # second cycle re-delivers k=2 and adds k=3: only k=3 lands
    _write_jsonl(
        os.path.join(src, "b.json"),
        [
            {"k": 2, "v": "two-again", "day": "d2"},
            {"k": 3, "v": "three", "day": "d2"},
        ],
    )
    upsert_stream(_stream(spark, src), out, ckpt, key_cols=["k"])
    rows = spark.read.parquet(out).collect()
    assert {r.k for r in rows} == {1, 2, 3}
    assert len(rows) == 3
    assert [r.v for r in rows if r.k == 2] == ["two"]  # original kept


def test_replace_partitions_rewrites_only_touched_partition(spark, tmp_path):
    tmp = str(tmp_path)
    src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    _write_jsonl(
        os.path.join(src, "a.json"),
        [
            {"k": 1, "v": "one", "day": "d1"},
            {"k": 2, "v": "two", "day": "d2"},
        ],
    )
    upsert_stream(
        _stream(spark, src), out, ckpt,
        key_cols=["k"], mode="replace_partitions", partition_by=["day"],
    )
    # reprocess day d2 with revised content; d1 must survive untouched
    _write_jsonl(
        os.path.join(src, "b.json"),
        [{"k": 9, "v": "two-revised", "day": "d2"}],
    )
    upsert_stream(
        _stream(spark, src), out, ckpt,
        key_cols=["k"], mode="replace_partitions", partition_by=["day"],
    )
    rows = {r.day: (r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert rows == {"d1": (1, "one"), "d2": (9, "two-revised")}
