"""True stream-stream interval join: two file streams, watermarks on
both sides, availableNow cycles with checkpointed restart."""

import json
import os

from computer_vision_foundations_spark.streaming.joins import stream_interval_join

CLICKS = "user_id LONG, click_id LONG, click_ts TIMESTAMP"
BUYS = "user_id LONG, buy_id LONG, buy_ts TIMESTAMP"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    tmp = str(tmp_path)
    cdir, bdir, out, ckpt = (
        os.path.join(tmp, d) for d in ("clicks", "buys", "out", "ckpt")
    )
    os.makedirs(cdir)
    os.makedirs(bdir)

    _write(
        os.path.join(cdir, "c1.json"),
        [
            {"user_id": 1, "click_id": 10, "click_ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "click_id": 11, "click_ts": "2024-01-01 10:20:00"},
            {"user_id": 2, "click_id": 12, "click_ts": "2024-01-01 10:00:00"},
        ],
    )
    _write(
        os.path.join(bdir, "b1.json"),
        [
            # 5 min after click 10: joins to it, not to click 11
            {"user_id": 1, "buy_id": 100, "buy_ts": "2024-01-01 10:05:00"},
            # no click for user 3
            {"user_id": 3, "buy_id": 101, "buy_ts": "2024-01-01 10:05:00"},
        ],
    )

    def run_cycle():
        buys = spark.readStream.schema(BUYS).json(bdir)
        clicks = spark.readStream.schema(CLICKS).json(cdir)
        joined = stream_interval_join(
            buys,
            clicks,
            on="user_id",
            left_ts="buy_ts",
            right_ts="click_ts",
            watermark="30 minutes",
            lower="10 minutes",
            upper="0 seconds",
        ).select("user_id", "buy_id", "click_id")
        (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_cycle()
    got = {(r.buy_id, r.click_id) for r in spark.read.parquet(out).collect()}
    assert got == {(100, 10)}

    # second cycle: a new buy joins a FIRST-cycle click (state kept
    # across the restart via the checkpoint)
    _write(
        os.path.join(bdir, "b2.json"),
        [{"user_id": 2, "buy_id": 102, "buy_ts": "2024-01-01 10:09:00"}],
    )
    run_cycle()
    got = {(r.buy_id, r.click_id) for r in spark.read.parquet(out).collect()}
    assert got == {(100, 10), (102, 12)}
