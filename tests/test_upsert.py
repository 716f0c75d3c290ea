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


def test_stream_upsert_acid_exactly_once(spark, tmp_path):
    """Streaming MERGE into the transactional format: re-delivered
    keys REPLACE (not skip), the commit log carries the per-app batch
    watermark, and a simulated checkpoint replay of an applied batch
    is a no-op (no duplicate rows, no extra version)."""
    from computer_vision_foundations_spark.sources.acid import (
        read_table,
        table_history,
    )
    from computer_vision_foundations_spark.streaming.upsert import (
        last_committed_batch,
        stream_upsert_acid,
    )

    tmp = str(tmp_path)
    src, root, ckpt = (os.path.join(tmp, d) for d in ("src", "t", "ckpt"))
    os.makedirs(src)

    _write_jsonl(
        os.path.join(src, "a.json"),
        [
            {"k": 1, "v": "one", "day": "d1"},
            {"k": 2, "v": "two", "day": "d1"},
        ],
    )
    stream_upsert_acid(
        _stream(spark, src), root, ckpt, key_cols=["k"], app_id="app"
    )
    assert {(r.k, r.v) for r in read_table(spark, root).collect()} == {
        (1, "one"),
        (2, "two"),
    }

    # second cycle: k=2 revised + k=3 new — MERGE semantics replace
    _write_jsonl(
        os.path.join(src, "b.json"),
        [
            {"k": 2, "v": "two-v2", "day": "d2"},
            {"k": 3, "v": "three", "day": "d2"},
        ],
    )
    stream_upsert_acid(
        _stream(spark, src), root, ckpt, key_cols=["k"], app_id="app"
    )
    rows = {(r.k, r.v) for r in read_table(spark, root).collect()}
    assert rows == {(1, "one"), (2, "two-v2"), (3, "three")}
    wm = last_committed_batch(root, "app")
    assert wm >= 1
    n_versions = len(table_history(root))

    # simulated crash-replay: re-apply an already-committed batch id
    # through the same code path — must be a silent no-op
    from computer_vision_foundations_spark.streaming import upsert as mod

    batch = spark.createDataFrame(
        [(2, "two-REPLAYED", "d2")], SCHEMA
    )
    # drive the foreachBatch body directly with a stale batch_id
    captured = {}

    def fake_foreach(fn):
        captured["fn"] = fn

        class _Q:
            def option(self, *a, **k):
                return self

            def trigger(self, *a, **k):
                return self

            def start(self):
                class _S:
                    def awaitTermination(self_inner):
                        fn(batch, wm)  # replayed batch id == watermark

                return _S()

        return _Q()

    class _WS:
        def foreachBatch(self, fn):
            return fake_foreach(fn)

    class _FakeStream:
        writeStream = _WS()

    mod.stream_upsert_acid(
        _FakeStream(), root, ckpt, key_cols=["k"], app_id="app"
    )
    rows_after = {(r.k, r.v) for r in read_table(spark, root).collect()}
    assert rows_after == rows  # replay changed nothing
    assert len(table_history(root)) == n_versions  # and committed nothing


def test_stream_upsert_acid_guards_and_first_batch_watermark(spark, tmp_path):
    """max_txn_retries<1 must raise (a 0-retry loop would silently
    drop batches), and the table-CREATING batch records its txn
    watermark so even batch 0 is replay-proof."""
    import pytest

    from computer_vision_foundations_spark.streaming.upsert import (
        last_committed_batch,
        stream_upsert_acid,
    )

    with pytest.raises(ValueError):
        stream_upsert_acid(
            None, str(tmp_path / "x"), str(tmp_path / "c"),
            key_cols=["k"], max_txn_retries=0,
        )

    tmp = str(tmp_path)
    src, root, ckpt = (os.path.join(tmp, d) for d in ("src", "t", "ckpt"))
    os.makedirs(src)
    _write_jsonl(
        os.path.join(src, "a.json"), [{"k": 1, "v": "one", "day": "d1"}]
    )
    stream_upsert_acid(
        _stream(spark, src), root, ckpt, key_cols=["k"], app_id="app"
    )
    assert last_committed_batch(root, "app") == 0  # batch 0 recorded
