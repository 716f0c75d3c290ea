"""Audio/video multimodal plumbing (functions/media.py).

The decode is a documented deterministic fake (no codecs in this
container); what these tests pin is the REAL part: schemas, Arrow
batch shapes, fan-out layout, null/empty handling, and the integer
contract the differential oracles (q39/q40) replay.
"""

import pyspark.sql.functions as F

from computer_vision_foundations_spark.functions.media import (
    audio_frame_energies,
    sample_video_frames,
    with_audio_metadata,
    with_video_metadata,
)


def _media_df(spark):
    rows = [
        (0, bytes(range(200))),          # real binary, non-ASCII bytes
        (1, b"x" * 64),                  # exactly one audio window
        (2, b""),                        # empty payload
        (3, None),                       # null payload
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_audio_metadata_struct(spark):
    out = {
        r.doc_id: r.audio_meta
        for r in with_audio_metadata(_media_df(spark)).collect()
    }
    assert out[0].n_samples == 200 and out[0].sample_rate == 16000
    assert abs(out[0].duration_sec - 200 / 16000) < 1e-12
    assert out[2].n_samples == 0 and out[3].n_samples == 0


def test_audio_frame_energies_integer_contract(spark):
    df = _media_df(spark)
    out = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", audio_frame_energies(64)(F.col("content")).alias("e")
        ).collect()
    }
    # doc 0: windows [0..63], [64..127], [128..191]; Σ(b-128) per window
    expect = [sum(range(64)) - 64 * 128, sum(range(64, 128)) - 64 * 128,
              sum(range(128, 192)) - 64 * 128]
    assert out[0] == expect
    assert out[1] == [(ord("x") - 128) * 64]
    assert out[2] == [] and out[3] == []


def test_video_metadata_struct(spark):
    out = {
        r.doc_id: r.video_meta
        for r in with_video_metadata(_media_df(spark)).collect()
    }
    assert out[0].n_frames == 8 + 200 % 8
    assert out[0].fps == 24.0 and out[0].width == 64
    assert out[2].n_frames == 8  # empty payload still has the floor


def test_sample_video_frames_layout(spark):
    df = _media_df(spark).filter("content IS NOT NULL")
    rows = sample_video_frames(df, every_n=2).collect()
    assert rows and set(rows[0].asDict()) == {
        "doc_id", "frame_idx", "ts_sec", "frame_key"
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 8 + 200 % 8 = 8 frames, every 2nd => idx 0,2,4,6;
    # key = byte at i*200//8 (content bytes are range(200))
    f0 = sorted(by_doc[0], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in f0] == list(range(0, 8, 2))
    assert all(r.frame_key == r.frame_idx * 200 // 8 for r in f0)
    assert all(abs(r.ts_sec - r.frame_idx / 24.0) < 1e-12 for r in f0)
    # empty payload: frames exist with key 0
    assert all(r.frame_key == 0 for r in by_doc[2])
