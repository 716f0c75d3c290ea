"""Stateful streaming operators (applyInPandasWithState): the
batch-mean EWMA drift alarm added in round 10."""

def test_ewma_batch_drift_alarm_fires_on_level_jump(spark, tmp_path):
    """A key whose batch means jump far beyond the carried sigma must
    alarm; a flat key must not. Hand-replayable: means 10, 11, 50 with
    alpha=0.5 -> after batch 2 level=10.5, var=0.25 (sigma=0.5); batch
    3 deviation |50-10.5|=39.5 > 0.5 -> alarm."""
    import os

    from computer_vision_foundations_spark.streaming.stateful import (
        ewma_batch_drift_stateful,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    batches = [
        [("jumpy", 10_000_000), ("flat", 5_000_000)],
        [("jumpy", 11_000_000), ("flat", 5_000_000)],
        [("jumpy", 50_000_000), ("flat", 5_000_000)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, vs long").coalesce(
            1
        ).write.parquet(os.path.join(landing, f"b{i}"))
        os.utime(os.path.join(landing, f"b{i}"), (1000 + i, 1000 + i))
    stream = (
        spark.readStream.schema("k string, vs long")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "b*"))
    )
    out = ewma_batch_drift_stateful(stream, key_col="k", scaled_col="vs")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_drift_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["k"], r["batch_seq"]): r
        for r in spark.table("ewma_drift_test").collect()
    }
    assert rows[("jumpy", 1)]["alarm"] is False  # seed batch
    assert rows[("jumpy", 2)]["alarm"] is False  # sigma still 0
    j3 = rows[("jumpy", 3)]
    assert j3["alarm"] is True and j3["sigma"] == 0.5
    assert rows[("jumpy", 2)]["level"] == 10.5
    assert all(not rows[("flat", b)]["alarm"] for b in (1, 2, 3))
