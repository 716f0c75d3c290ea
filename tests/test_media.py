"""Audio/video multimodal plumbing (functions/media.py).

Raw (non-container) bytes use the documented deterministic fake;
RIFF/WAVE bytes take the REAL from-scratch codec (functions/wav.py).
These tests pin both: schemas, Arrow batch shapes, fan-out layout,
null/empty handling, the integer contract the differential oracles
replay, and the WAV round trip bit-for-bit.
"""

import numpy as np
import pyspark.sql.functions as F

from computer_vision_foundations_spark.functions.media import (
    audio_frame_energies,
    encode_text_wav,
    sample_video_frames,
    wav_window_stats,
    with_audio_metadata,
    with_video_metadata,
)
from computer_vision_foundations_spark.functions.wav import (
    decode_wav,
    encode_wav,
    is_wav,
    resample_x2_linear,
    wav_metadata,
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


# ---------------------------------------------------------------------------
# Real WAV codec (functions/wav.py)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit_mono():
    x = ((np.arange(500, dtype=np.int64) * 2311) % 65536 - 32768).astype(
        np.int16
    )
    b = encode_wav(x, 8000)
    assert is_wav(b) and len(b) % 2 == 0
    y, rate, bits = decode_wav(b)
    assert (rate, bits, y.shape) == (8000, 16, (500, 1))
    assert (y[:, 0] == x.astype(np.int32)).all()
    assert wav_metadata(b) == (8000, 1, 500)


def test_wav_roundtrip_stereo_and_8bit():
    left = np.arange(-100, 100, dtype=np.int32)
    st = np.stack([left, -left], axis=1).astype(np.int16)
    y, rate, _ = decode_wav(encode_wav(st, 44_100))
    assert rate == 44_100 and (y == st.astype(np.int32)).all()
    x8 = np.arange(-128, 128, dtype=np.int64)
    y8, _, bits8 = decode_wav(encode_wav(x8, 16_000, bits=8))
    assert bits8 == 8 and (y8[:, 0] == x8).all()


def test_wav_unknown_chunk_skip_and_pad():
    """Foreign writers may put LIST/fact chunks before data; odd-sized
    chunks carry a word-alignment pad byte the walker must skip."""
    import struct

    x = np.array([5, -5, 7], dtype=np.int16)
    b = encode_wav(x, 8000)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = b[:12] + extra + b[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    y, rate, _ = decode_wav(patched)
    assert rate == 8000 and y[:, 0].tolist() == [5, -5, 7]
    assert wav_metadata(patched) == (8000, 1, 3)


def test_wav_rejects_non_pcm_and_truncation():
    import pytest
    import struct

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    b = bytearray(encode_wav(np.array([1, 2], dtype=np.int16), 8000))
    struct.pack_into("<H", b, 20, 3)  # wFormatTag = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(b))


def test_resample_x2_linear_integer_contract():
    r = resample_x2_linear(np.array([0, 10, -7]))
    assert r.tolist() == [0, 5, 10, 1, -7, -7]
    st = resample_x2_linear(np.array([[0, 100], [10, -100]]))
    assert st.tolist() == [[0, 100], [5, 0], [10, -100], [10, -100]]
    assert resample_x2_linear(np.zeros(0, dtype=np.int64)).tolist() == []


def test_audio_metadata_real_wav_path(spark):
    """RIFF bytes get the real header parse; raw bytes keep the fake."""
    wav_bytes = encode_wav(
        np.zeros((250, 2), dtype=np.int16), sample_rate=22_050
    )
    df = spark.createDataFrame(
        [(0, bytearray(wav_bytes)), (1, b"just bytes")],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.audio_meta for r in with_audio_metadata(df).collect()
    }
    assert out[0].sample_rate == 22_050 and out[0].n_channels == 2
    assert out[0].n_samples == 250
    assert abs(out[0].duration_sec - 250 / 22_050) < 1e-12
    assert out[1].sample_rate == 16_000 and out[1].n_samples == 10


def test_wav_window_stats_matches_numpy(spark):
    """encode→decode→windowed stats equals direct numpy on the PCM."""
    text = "The quick brown fox jumps over the lazy dog! " * 3
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = (
        df.select(
            wav_window_stats(32)(encode_text_wav(F.col("text"))).alias("ws")
        )
        .collect()[0]
    )
    pcm = (
        np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64) - 128
    ) * 256
    n_full = len(pcm) // 32
    w = pcm[: n_full * 32].reshape(n_full, 32)
    assert len(row.ws) == n_full
    for i, s in enumerate(row.ws):
        assert s.widx == i
        assert s.energy == int((w[i] * w[i]).sum())
        nonneg = w[i] >= 0
        assert s.zcr == int((nonneg[1:] != nonneg[:-1]).sum())
        assert s.peak == int(np.abs(w[i]).max())


def test_register_media_functions_sql_surface(spark):
    """Named-UDF SQL parity (the reference's spark.udf.register shape,
    02_Data Ingest.py:204,252) for the audio/video modality."""
    from computer_vision_foundations_spark.functions.media import (
        register_media_functions,
    )

    register_media_functions(spark)
    wav_bytes = encode_wav(np.zeros((100, 1), dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(0, bytearray(wav_bytes))], "doc_id long, content binary"
    )
    df.createOrReplaceTempView("media_sql_test")
    row = spark.sql(
        "SELECT get_audio_metadata(content) AS am,"
        "       get_video_metadata(content) AS vm,"
        "       wav_window_stats(content)   AS ws "
        "FROM media_sql_test"
    ).collect()[0]
    assert row.am.sample_rate == 8000 and row.am.n_samples == 100
    assert row.vm.fps == 24.0  # WAV bytes are not a GIF: fake video path
    assert len(row.ws) == 3  # 100 samples // 32


def _wav_property_check(vals, rate, bits):
    import numpy as np

    if bits == 8:
        arr = (np.asarray(vals, dtype=np.int64) % 256) - 128
    else:
        arr = (np.asarray(vals, dtype=np.int64) % 65536 - 32768).astype(
            np.int16
        )
    y, got_rate, got_bits = decode_wav(encode_wav(arr, rate, bits=bits))
    assert got_rate == rate and got_bits == bits
    assert (y[:, 0] == arr.astype(np.int32)).all()


def test_wav_roundtrip_property():
    """Hypothesis: any int sequence round-trips bit-exactly at both
    widths and arbitrary sample rates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1,
                 max_size=500),
        st.sampled_from([8_000, 16_000, 44_100, 48_000]),
        st.sampled_from([8, 16]),
    )
    def inner(vals, rate, bits):
        _wav_property_check(vals, rate, bits)

    inner()


def test_corrupt_containers_fall_back_not_crash(spark):
    """A corrupt blob must NOT kill the job: RIFF/GIF magic with a
    malformed body falls back to the documented fake paths in every
    sniffed UDF (metadata, window stats, frame sampling)."""
    from computer_vision_foundations_spark.functions.media import (
        sample_video_frames,
        with_video_metadata,
    )

    bad_wav = b"RIFF\xff\xff\xff\xffWAVEgarbage-no-chunks"
    bad_gif = b"GIF89a\x05\x00"  # truncated before the screen packed byte
    df = spark.createDataFrame(
        [(0, bad_wav), (1, bad_gif)], "doc_id long, content binary"
    )
    am = {r.doc_id: r.audio_meta for r in with_audio_metadata(df).collect()}
    assert am[0].sample_rate == 16_000  # fake path engaged
    assert am[0].n_samples == len(bad_wav)
    vm = {r.doc_id: r.video_meta for r in with_video_metadata(df).collect()}
    assert vm[1].fps == 24.0 and vm[1].n_frames == 8 + len(bad_gif) % 8
    ws = df.select(wav_window_stats(8)(F.col("content")).alias("w")).collect()
    assert all(r.w is not None for r in ws)
    frames = sample_video_frames(df, every_n=2).collect()
    assert frames  # fake sampler produced rows for both blobs


def test_wav_header_validation_no_zero_division(spark):
    """Review findings: corrupt-but-magic headers (0 channels, 0 rate,
    non-PCM, sub-byte depth) must raise the fallback-able ValueError
    from BOTH wav_metadata and decode_wav — never ZeroDivisionError —
    and the metadata UDF must fall back to the fake (no inf
    durations)."""
    import struct as st

    import pytest

    base = bytearray(encode_wav(np.array([1, 2, 3], dtype=np.int16), 8000))
    cases = []
    for field_off, value in ((22, 0), (24, 0), (20, 3), (34, 4)):
        bad = bytearray(base)
        st.pack_into("<H", bad, field_off, value)  # ch / rate / tag / bits
        cases.append(bytes(bad))
    for blob in cases:
        with pytest.raises(ValueError):
            wav_metadata(blob)
        with pytest.raises(ValueError):
            decode_wav(blob)
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(cases)], "doc_id long, content binary"
    )
    for r in with_audio_metadata(df).collect():
        assert r.audio_meta.sample_rate == 16_000  # fake path
        assert r.audio_meta.duration_sec < 1e9  # no Infinity


def test_gif_header_bomb_bounded(spark):
    """A 30-byte blob declaring a 65535x65535 canvas must raise the
    fallback-able ValueError instead of allocating gigabytes."""
    import struct as st

    import pytest
    from computer_vision_foundations_spark.functions.gif import decode_gif

    bomb = bytearray(b"GIF89a")
    bomb += st.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    bomb += b"\x2c" + st.pack("<HHHHB", 0, 0, 65535, 65535, 0)
    bomb += b"\x08\x00\x3b"
    with pytest.raises(ValueError):
        decode_gif(bytes(bomb))
    # and the sniffed UDF path falls back instead of dying
    df = spark.createDataFrame(
        [(0, bytes(bomb))], "doc_id long, content binary"
    )
    from computer_vision_foundations_spark.functions.media import (
        sample_video_frames,
        with_video_metadata,
    )

    assert with_video_metadata(df).collect()[0].video_meta.fps in (24.0,)
    assert sample_video_frames(df, every_n=2).collect()
