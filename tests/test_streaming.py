"""Streaming ingest: availableNow file stream → parquet sink with
checkpoint-restart idempotence (reference ST1-ST4,
`02_Data Ingest.py:26-31,273-282`)."""

import os

import pytest

from computer_vision_foundations_spark.plans.pipeline import (
    IngestConfig,
    PipelineConfig,
    SinkConfig,
)
from computer_vision_foundations_spark.streaming.ingest import run_ingest


def _drop_file(landing, name, payload=b"x" * 64):
    with open(os.path.join(landing, name), "wb") as f:
        f.write(payload)


def _cfg(tmp, with_udfs=False):
    # NB: Hadoop's local Path cannot contain ':' (URI scheme separator),
    # so unlike object-store keys the local fixture filenames use
    # 'HH-mm-ss' and pass an explicit ts_format.
    return PipelineConfig(
        ingest=IngestConfig(
            input_path=os.path.join(tmp, "landing"),
            glob="*.jpg",
            recursive=True,
            max_files_per_trigger=10,
            ts_format="yyyy-MM-dd HH-mm-ss",
        ),
        sink=SinkConfig(
            format="parquet",
            output_path=os.path.join(tmp, "out"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            partition_by=("date",),
        ),
        extract_metadata=with_udfs,
        extract_statistics=with_udfs,
    )


def test_ingest_available_now_and_restart(spark, tmp_path):
    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _drop_file(landing, "2024-05-01 10-00-00_cam_a_0.jpg")
    _drop_file(landing, "2024-05-01 11-00-00_cam_b_1.jpg")
    _drop_file(landing, "ignored.txt")  # glob-filtered out

    cfg = _cfg(tmp)
    run_ingest(spark, cfg)
    out1 = spark.read.parquet(cfg.sink.output_path)
    assert out1.count() == 2
    assert set(out1.select("label").toPandas()["label"]) == {0, 1}
    # partitioned layout on disk → partition pruning works
    assert any(d.startswith("date=") for d in os.listdir(cfg.sink.output_path))

    # restart with no new files: checkpoint makes it a no-op
    run_ingest(spark, cfg)
    assert spark.read.parquet(cfg.sink.output_path).count() == 2

    # drop one more file: only the delta is processed
    _drop_file(landing, "2024-05-02 09-00-00_cam_a_1.jpg")
    run_ingest(spark, cfg)
    out3 = spark.read.parquet(cfg.sink.output_path)
    assert out3.count() == 3


def test_ingest_with_image_udfs(spark, tmp_path):
    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _drop_file(landing, "2024-06-01 08-00-00_cam_c_1.jpg", b"fakejpgbytes" * 10)
    cfg = _cfg(tmp, with_udfs=True)
    run_ingest(spark, cfg)
    out = spark.read.parquet(cfg.sink.output_path)
    row = out.select("metadata.height", "statistics.entropy", "label").collect()[0]
    assert row.height >= 1 and row.entropy >= 0.0 and row.label == 1


def test_scoring_stream(spark, tmp_path):
    """EP3: second landing-dir consumer -> (path, score) parquet with
    its own checkpoint (reference `04a_Model Deployment.py:248-269`)."""
    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _drop_file(landing, "2024-07-01 10-00-00_cam_a_0.jpg", b"abc")
    _drop_file(landing, "2024-07-01 10-05-00_cam_a_1.jpg", b"defgh")

    from computer_vision_foundations_spark.streaming.ingest import (
        run_scoring_stream,
    )

    def predict(batch):
        return batch["content"].map(len).astype("float64")

    cfg = _cfg(tmp)
    run_scoring_stream(
        spark,
        cfg,
        predict,
        output_path=os.path.join(tmp, "scores"),
        checkpoint_path=os.path.join(tmp, "score_ckpt"),
    )
    out = spark.read.parquet(os.path.join(tmp, "scores"))
    rows = {os.path.basename(r.path): r.score for r in out.collect()}
    assert len(rows) == 2
    assert rows["2024-07-01 10-00-00_cam_a_0.jpg"] == 3.0
    assert rows["2024-07-01 10-05-00_cam_a_1.jpg"] == 5.0


def _write_events_file(path, rows):
    import json

    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_tumbling_watermark_finalizes_and_drops_late(
    spark, tmp_path
):
    """True streaming run of the watermarked tumbling agg (ST5): append
    mode emits a window only once the watermark passes its end, and
    events behind the watermark are dropped across checkpointed
    restarts."""
    from computer_vision_foundations_spark.streaming.windows import (
        tumbling_counts,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    out = os.path.join(tmp, "win_out")
    ckpt = os.path.join(tmp, "win_ckpt")
    os.makedirs(src)

    def run_cycle():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        agg = tumbling_counts(
            stream, duration="1 hour", watermark="0 seconds"
        )
        (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _write_events_file(
        os.path.join(src, "b1.json"),
        [
            {"ts": "2024-05-01T10:00:00", "event_type": "a", "value": 1.0},
            {"ts": "2024-05-01T10:30:00", "event_type": "a", "value": 2.0},
        ],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        [{"ts": "2024-05-01T12:00:00", "event_type": "a", "value": 4.0}],
    )
    run_cycle()
    finalized = spark.read.parquet(out)
    rows = {r.window_start.hour: r for r in finalized.collect()}
    # watermark reached 12:00 => the 10:00 window finalized; the 12:00
    # window is still open when the stream drains
    assert 10 in rows and rows[10].n_events == 2 and rows[10].sum_value == 3.0
    assert 12 not in rows

    # restart with one late event (10:45 < watermark): dropped; and one
    # event at 14:00 that pushes the watermark past the 12:00 window
    _write_events_file(
        os.path.join(src, "b3.json"),
        [
            {"ts": "2024-05-01T10:45:00", "event_type": "a", "value": 100.0},
            {"ts": "2024-05-01T14:00:00", "event_type": "a", "value": 8.0},
        ],
    )
    run_cycle()
    rows2 = {r.window_start.hour: r for r in spark.read.parquet(out).collect()}
    assert rows2[10].n_events == 2 and rows2[10].sum_value == 3.0  # late drop
    assert rows2[12].n_events == 1 and rows2[12].sum_value == 4.0


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches
    (batch_seq increments, totals are cumulative) and across
    checkpointed restarts."""
    from computer_vision_foundations_spark.streaming.stateful import (
        running_totals_stateful,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "state_ckpt")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [{"user_id": 1, "value": 10.0}, {"user_id": 2, "value": 5.0}],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        [{"user_id": 1, "value": 7.0}],
    )

    collected = []

    def run_cycle():
        stream = (
            spark.readStream.schema("user_id bigint, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        totals = running_totals_stateful(stream, "user_id", "value")
        (
            totals.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: collected.extend(df.collect())
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_cycle()
    u1 = [r for r in collected if r.user_id == 1]
    u1.sort(key=lambda r: r.batch_seq)
    assert [(r.n_events, r.sum_value) for r in u1] == [(1, 10.0), (2, 17.0)]
    assert [r.batch_seq for r in u1] == [1, 2]

    # restart: state restored from checkpoint, new batch accumulates on top
    _write_events_file(
        os.path.join(src, "b3.json"),
        [{"user_id": 1, "value": 3.0}],
    )
    collected.clear()
    run_cycle()
    u1b = [r for r in collected if r.user_id == 1]
    assert [(r.n_events, r.sum_value, r.batch_seq) for r in u1b] == [
        (3, 20.0, 3)
    ]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup_stream drops re-delivered event ids across micro-batches
    while the key is inside the watermark horizon."""
    from computer_vision_foundations_spark.streaming.windows import (
        dedup_stream,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    out = os.path.join(tmp, "dedup_out")
    ckpt = os.path.join(tmp, "dedup_ckpt")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [
            {"event_id": 1, "ts": "2024-05-01T10:00:00", "value": 1.0},
            {"event_id": 1, "ts": "2024-05-01T10:00:00", "value": 1.0},
            {"event_id": 2, "ts": "2024-05-01T10:01:00", "value": 2.0},
        ],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        [
            # re-delivery of id 1 in a later micro-batch, still within
            # the 1h watermark horizon -> dropped by state
            {"event_id": 1, "ts": "2024-05-01T10:02:00", "value": 1.0},
            {"event_id": 3, "ts": "2024-05-01T10:03:00", "value": 3.0},
        ],
    )
    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    deduped = dedup_stream(stream, keys=("event_id",), watermark="1 hour")
    (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3]


def test_streaming_session_window_counts(spark, tmp_path):
    """streaming_session_counts merges events within the gap into one
    session and emits it once the watermark closes it."""
    from computer_vision_foundations_spark.streaming.windows import (
        streaming_session_counts,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    out = os.path.join(tmp, "sess_out")
    ckpt = os.path.join(tmp, "sess_ckpt")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [
            {"user_id": 1, "ts": "2024-05-01T10:00:00"},
            {"user_id": 1, "ts": "2024-05-01T10:10:00"},  # same session
        ],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        # 6h later: closes user 1's first session once watermark advances
        [{"user_id": 1, "ts": "2024-05-01T16:00:00"}],
    )
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sessions = streaming_session_counts(
        stream, gap="30 minutes", watermark="0 seconds"
    )
    (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1  # only the closed session is emitted
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 2
    assert r.session_start.hour == 10 and r.session_end.minute == 40


def test_kill_and_resume_exactly_once(spark, tmp_path):
    """ST3 hard evidence: interrupt the stream mid-backlog, resume from
    the same checkpoint, and the union of outputs is exactly-once —
    every file present once, none lost, none duplicated."""
    from computer_vision_foundations_spark.streaming.ingest import (
        run_ingest_interrupted,
    )

    tmp = str(tmp_path)
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    n_files = 40
    for i in range(n_files):
        _drop_file(
            landing,
            f"2024-05-{i % 28 + 1:02d} 10-00-{i % 60:02d}_cam_{i:03d}_{i % 2}.jpg",
        )
    cfg = _cfg(tmp)  # max_files_per_trigger=10 -> 4 batches of backlog
    committed = run_ingest_interrupted(spark, cfg, stop_after_batches=1)
    assert committed >= 1
    partial = spark.read.parquet(cfg.sink.output_path).count()
    assert partial < n_files  # the interrupt really left a backlog

    run_ingest(spark, cfg)  # resume from the same checkpoint
    out = spark.read.parquet(cfg.sink.output_path)
    assert out.count() == n_files  # no loss
    paths = [r.path for r in out.select("path").collect()]
    assert len(set(paths)) == n_files  # no duplicates


def test_watermark_eviction_metric(spark, tmp_path):
    """ST5 late-data evidence: rows arriving behind the watermark are
    dropped from the stateful aggregation, and the drop is OBSERVABLE
    via the progress metric (numRowsDroppedByWatermark) — the signal a
    production pipeline alarms on."""
    import json
    import time

    from computer_vision_foundations_spark.streaming.windows import (
        tumbling_counts,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"
    # batch 1: on-time events at 10:00..12:00 -> watermark advances to
    # max(ts) - 1h = 11:00
    spark.createDataFrame(
        [
            ("2024-05-01 10:00:00", "click", 1.0),
            ("2024-05-01 11:30:00", "click", 2.0),
            ("2024-05-01 12:00:00", "view", 3.0),
        ],
        "ts string, event_type string, value double",
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "event_type", "value").coalesce(
        1
    ).write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    agg = tumbling_counts(stream, watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # batch 2: one late event behind the 11:00 watermark, one on time
    spark.createDataFrame(
        [
            ("2024-05-01 09:00:00", "click", 9.0),  # LATE -> dropped
            ("2024-05-01 12:30:00", "view", 4.0),
        ],
        "ts string, event_type string, value double",
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "event_type", "value").coalesce(
        1
    ).write.parquet(os.path.join(src, "b2"))
    q2 = (
        agg.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for so in p.get("stateOperators", [])
    )
    assert dropped >= 1


def test_stateful_kmv_distinct_across_batches(spark, tmp_path):
    """approx_distinct_stateful: the state-store KMV sketch is exact
    below k, carries across micro-batches and restarts, and matches
    the batch sketch estimator bit-for-bit on the same data."""
    import hashlib

    from computer_vision_foundations_spark.streaming.stateful import (
        approx_distinct_stateful,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "kmv_ckpt")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [{"user_id": 1, "event_type": t} for t in ["a", "b", "a"]],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        [{"user_id": 1, "event_type": t} for t in ["b", "c"]],
    )

    collected = []

    def run_cycle(k=64):
        stream = (
            spark.readStream.schema("user_id bigint, event_type string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = approx_distinct_stateful(
            stream, "user_id", "event_type", k=k
        )
        (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: collected.extend(df.collect())
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_cycle()
    u1 = sorted(
        (r for r in collected if r.user_id == 1),
        key=lambda r: r.batch_seq,
    )
    # below k the sketch is exact: 2 distinct after b1, 3 after b2
    assert [(r.approx_distinct, r.n_hashes) for r in u1] == [
        (2.0, 2), (3.0, 3),
    ]

    # restart on checkpoint: distinct count keeps accumulating
    _write_events_file(
        os.path.join(src, "b3.json"),
        [{"user_id": 1, "event_type": "d"}, {"user_id": 2, "event_type": "x"}],
    )
    collected.clear()
    run_cycle()
    u1b = [r for r in collected if r.user_id == 1]
    assert u1b and u1b[-1].approx_distinct == 4.0
    u2 = [r for r in collected if r.user_id == 2]
    assert u2 and u2[-1].approx_distinct == 1.0


def test_stateful_kmv_matches_batch_estimator_above_k(spark, tmp_path):
    """Above k the streamed estimate equals the batch KMV estimator
    computed over the SAME accumulated values (identical hash math)."""
    import hashlib

    from computer_vision_foundations_spark.streaming.stateful import (
        approx_distinct_stateful,
    )

    k = 8
    values = [f"v{i}" for i in range(40)]
    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "kmv_ckpt2")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [{"user_id": 7, "event_type": v} for v in values],
    )

    collected = []
    stream = (
        spark.readStream.schema("user_id bigint, event_type string")
        .json(src)
    )
    out = approx_distinct_stateful(stream, "user_id", "event_type", k=k)
    (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, epoch: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = collected[-1].approx_distinct
    hs = sorted(hashlib.md5(v.encode()).hexdigest() for v in set(values))[:k]
    theta = int(hs[-1][:13], 16) / float(16**13)
    assert got == (k - 1) / theta  # bit-identical estimator
    assert collected[-1].n_hashes == k


def test_stateful_spacesaving_exact_below_k_and_across_batches(
    spark, tmp_path
):
    """topk_spacesaving_stateful: exact counts (error 0) while a key
    has seen <= k distinct items, cumulative across micro-batches and
    checkpoint restarts."""
    from computer_vision_foundations_spark.streaming.stateful import (
        topk_spacesaving_stateful,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "ss_ckpt")
    os.makedirs(src)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [{"user_id": u, "event_type": "t"} for u in [1, 1, 2]],
    )
    _write_events_file(
        os.path.join(src, "b2.json"),
        [{"user_id": u, "event_type": "t"} for u in [1, 3]],
    )

    collected = []

    def run_cycle(k=8):
        stream = (
            spark.readStream.schema("user_id bigint, event_type string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = topk_spacesaving_stateful(
            stream, "event_type", "user_id", k=k
        )
        (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: collected.extend(df.collect())
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_cycle()
    last = {
        r.item: (r["count"], r.error)
        for r in collected
        if r.batch_seq == 2
    }
    # cumulative exact counts: user 1 seen 3x, 2 once, 3 once
    assert last == {"1": (3, 0), "2": (1, 0), "3": (1, 0)}

    # restart from checkpoint: state carries
    _write_events_file(
        os.path.join(src, "b3.json"),
        [{"user_id": 2, "event_type": "t"}],
    )
    collected.clear()
    run_cycle()
    last = {
        r.item: r["count"] for r in collected if r.batch_seq == 3
    }
    assert last["2"] == 2 and last["1"] == 3


def test_stateful_spacesaving_bounds_hold_under_eviction(
    spark, tmp_path
):
    """With k smaller than the item universe, the Space-Saving
    guarantees hold: count-error <= true <= count for every tracked
    item, and the overall top item is tracked."""
    from computer_vision_foundations_spark.streaming.stateful import (
        topk_spacesaving_stateful,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "ss2_ckpt")
    os.makedirs(src)
    # heavy item 100 (7x), then a tail of singletons forcing eviction
    vals = [100] * 7 + list(range(1, 10))
    _write_events_file(
        os.path.join(src, "b1.json"),
        [{"user_id": v, "event_type": "t"} for v in vals],
    )
    stream = (
        spark.readStream.schema("user_id bigint, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = topk_spacesaving_stateful(stream, "event_type", "user_id", k=4)
    collected = []
    (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, epoch: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    true = {str(v): vals.count(v) for v in set(vals)}
    tracked = {r.item: (r["count"], r.error) for r in collected}
    assert len(tracked) == 4
    assert "100" in tracked  # the heavy hitter survives eviction
    for it, (cnt, err) in tracked.items():
        assert cnt - err <= true[it] <= cnt


def test_stateful_ewma_drift_alarm(spark, tmp_path):
    """ewma_drift_stateful: no alarm during burn-in or on-level
    batches; a level jump after burn-in raises the alarm; the level
    updates AFTER the test so the jump can't hide itself."""
    from computer_vision_foundations_spark.streaming.stateful import (
        ewma_drift_stateful,
    )

    tmp = str(tmp_path)
    src = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "drift_ckpt")
    os.makedirs(src)
    # batch 1: 20 values ~ 10 with small wiggle (burn-in, no alarm)
    _write_events_file(
        os.path.join(src, "b1.json"),
        [
            {"event_type": "t", "value": 10.0 + (i % 3) * 0.1}
            for i in range(20)
        ],
    )
    # batch 2: on-level -> no alarm
    _write_events_file(
        os.path.join(src, "b2.json"),
        [{"event_type": "t", "value": 10.1} for _ in range(5)],
    )
    collected = []

    def run_cycle():
        stream = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = ewma_drift_stateful(stream, "event_type", "value")
        (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: collected.extend(df.collect())
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_cycle()
    assert not any(r.alarm for r in collected)  # burn-in + on-level

    # batch 3 (after a checkpoint restart): jump to 50 -> alarm
    _write_events_file(
        os.path.join(src, "b3.json"),
        [{"event_type": "t", "value": 50.0} for _ in range(5)],
    )
    collected.clear()
    run_cycle()
    (last,) = collected
    assert last.alarm and last.batch_seq == 3
    assert last.n_seen == 30
    assert last.batch_mean == pytest.approx(50.0)


def test_calibrate_files_per_trigger_measures_sizes(spark, tmp_path):
    from computer_vision_foundations_spark.sources.binaryfile import (
        DEFAULT_BYTES_PER_CORE_PER_TRIGGER,
        calibrate_files_per_trigger,
        files_per_trigger_for_bytes,
    )

    land = tmp_path / "land"
    land.mkdir()
    for i in range(8):
        (land / f"f{i}.jpg").write_bytes(b"x" * 1024)  # 1 KiB each
    n = calibrate_files_per_trigger(
        spark, str(land), glob="*.jpg", bytes_per_core=1024 * 1024,
        safety=1.0,
    )
    par = spark.sparkContext.defaultParallelism
    # 1 MiB/core budget at 1 KiB/file -> 1024 files per core
    assert n == 1024 * par
    # safety factor shrinks the admitted count
    n_safe = calibrate_files_per_trigger(
        spark, str(land), glob="*.jpg", bytes_per_core=1024 * 1024,
        safety=2.0,
    )
    assert n_safe == 512 * par


def test_calibrate_empty_prefix_falls_back_to_static(spark, tmp_path):
    from computer_vision_foundations_spark.sources.binaryfile import (
        calibrate_files_per_trigger,
        files_per_trigger_for_bytes,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    assert calibrate_files_per_trigger(
        spark, str(empty), glob="*.jpg"
    ) == files_per_trigger_for_bytes(spark)
