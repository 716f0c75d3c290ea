import pytest

from computer_vision_foundations_spark.operators.video import detect_scene_cuts


@pytest.fixture(scope="module")
def frames(spark):
    # (doc_id, frame_idx, ts_sec, frame_key)
    rows = [
        (1, 0, 0.00, 100),
        (1, 1, 0.05, 120),   # delta 20: no cut
        (1, 2, 0.10, 400),   # delta 280: cut
        (1, 3, 0.15, 250),   # delta 150: boundary -> cut (inclusive)
        (1, 4, 0.20, 101),   # delta 149: no cut
        (2, 0, 0.00, 999),   # first frame never cuts even after doc 1's 101
        (2, 1, 0.05, 999),   # delta 0
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "frame_idx", "ts_sec", "frame_key"]
    )


def test_cut_semantics(frames):
    cuts = detect_scene_cuts(frames, threshold=150).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in cuts}
    assert set(got) == {(1, 2), (1, 3)}
    assert got[(1, 2)]["delta"] == 280
    assert got[(1, 2)]["prev_key"] == 120
    assert got[(1, 3)]["delta"] == 150


def test_partition_isolation(frames):
    # doc 2's first frame must not be compared against doc 1's last
    cuts = detect_scene_cuts(frames, threshold=1).collect()
    assert all(r["doc_id"] != 2 for r in cuts)


def test_negative_jumps_count(spark):
    rows = [(1, 0, 0.0, 500), (1, 1, 0.05, 100)]
    df = spark.createDataFrame(
        rows, ["doc_id", "frame_idx", "ts_sec", "frame_key"]
    )
    cuts = detect_scene_cuts(df, threshold=300).collect()
    assert len(cuts) == 1 and cuts[0]["delta"] == 400
