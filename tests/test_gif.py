"""From-scratch GIF codec (functions/gif.py) + media integration.

Pins the LZW bit-level contract (variable code width, CLEAR/EOI, the
12-bit table cap and reset, the KwKwK case), the container round trip
(palette, multi-frame, delays), interlace re-ordering, transparency /
disposal compositing, the header-only metadata walk, and the real
decode paths in media.with_video_metadata / sample_video_frames.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from computer_vision_foundations_spark.functions.gif import (
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_metadata,
    is_gif,
)
from computer_vision_foundations_spark.functions.media import (
    encode_text_gif,
    sample_video_frames,
    with_video_metadata,
)

GRAY = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs", [2, 4, 8])
@pytest.mark.parametrize("n", [1, 2, 17, 300, 5000])
def test_lzw_roundtrip_sizes(mcs, n):
    rng = np.random.RandomState(mcs * 1000 + n)
    x = rng.randint(0, 1 << mcs, size=n).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(x, mcs), mcs, n) == x).all()


def test_lzw_table_overflow_reset():
    """> 4096 dictionary entries forces the in-stream CLEAR reset."""
    x = (np.arange(70_000) % 256).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(x, 8), 8, len(x)) == x).all()


def test_lzw_kwkwk_case():
    """'ababab...' exercises the code == next_code special case."""
    x = np.tile(np.array([0, 1], np.uint8), 5000)
    assert (_lzw_decode(_lzw_encode(x, 2), 2, len(x)) == x).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 255), min_size=1, max_size=2000),
    st.sampled_from([2, 5, 8]),
)
def test_lzw_roundtrip_property(vals, mcs):
    x = (np.asarray(vals, dtype=np.int64) % (1 << mcs)).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(x, mcs), mcs, len(x)) == x).all()


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def test_gif_roundtrip_animated_grayscale():
    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, size=(6, 5)).astype(np.uint8) for _ in range(4)
    ]
    b = encode_gif(frames, GRAY, delays_cs=[1, 2, 3, 4])
    assert is_gif(b)
    dec, delays, (w, h) = decode_gif(b)
    assert (w, h) == (5, 6) and delays == [1, 2, 3, 4]
    for f, d in zip(frames, dec):
        assert (d[:, :, 0] == f).all()
        assert (d[:, :, 1] == f).all() and (d[:, :, 2] == f).all()
    assert gif_metadata(b) == (5, 6, 4, 1)


def test_gif_small_palette_depth():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    fr = (np.arange(12).reshape(3, 4) % 3).astype(np.uint8)
    dec, _, _ = decode_gif(encode_gif([fr], pal))
    assert (dec[0] == pal[fr]).all()


def test_gif_interlace_decode():
    """Hand-build an interlaced image descriptor: rows arrive in pass
    order and must land back at their original positions."""
    h, w = 9, 3
    img = (np.arange(h * w).reshape(h, w) % 256).astype(np.uint8)
    order = [y for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(s, h, t)]
    rows_in_stream = img[np.asarray(order)]
    assert (_deinterlace(rows_in_stream) == img).all()
    # full container path: encode non-interlaced, flip the interlace
    # bit and reorder the pixel stream
    b = bytearray(encode_gif([img], GRAY))
    # image descriptor starts after header(13) + GCT(768) + GCE(8)
    idesc = 13 + 768 + 8
    assert b[idesc] == 0x2C
    b[idesc + 9] |= 0x40  # interlace flag
    mcs = b[idesc + 10]
    comp = _lzw_encode(rows_in_stream.ravel(), mcs)
    out = bytearray(b[: idesc + 11])
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dec, _, _ = decode_gif(bytes(out))
    assert (dec[0][:, :, 0] == img).all()


def test_gif_transparency_and_disposal():
    """Frame 2 has a transparent hole: pixels show frame 1 beneath
    (disposal 1 = keep); with disposal 2 the canvas resets to
    background between frames."""
    pal = np.array([[10, 10, 10], [200, 200, 200], [77, 77, 77]], np.uint8)
    f1 = np.zeros((2, 2), np.uint8)          # all color 0
    f2 = np.array([[1, 2], [2, 1]], np.uint8)  # color 2 = transparent
    b = bytearray(encode_gif([f1, f2], pal, delays_cs=4))
    # patch BOTH graphic-control extensions:
    #   GCE layout: 21 f9 04 <packed> <delay lo hi> <transparent> 00
    gce_positions = [i for i in range(len(b) - 1)
                     if b[i] == 0x21 and b[i + 1] == 0xF9]
    assert len(gce_positions) == 2
    # frame 1: disposal=1 (keep)
    b[gce_positions[0] + 3] = (1 << 2)
    # frame 2: transparency on, index 2
    b[gce_positions[1] + 3] = (1 << 2) | 1
    b[gce_positions[1] + 6] = 2
    dec, _, _ = decode_gif(bytes(b))
    assert (dec[0] == pal[0]).all()
    # transparent pixels (value 2) show frame 1's color 0 underneath
    expect = np.where((f2 == 2)[:, :, None], pal[0], pal[np.minimum(f2, 2)])
    assert (dec[1] == expect).all()


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"definitely not a gif")
    with pytest.raises(ValueError):
        gif_metadata(b"")


# ---------------------------------------------------------------------------
# media.py integration
# ---------------------------------------------------------------------------


def test_video_metadata_real_gif_path(spark):
    rng = np.random.RandomState(5)
    frames = [
        rng.randint(0, 256, size=(7, 9)).astype(np.uint8) for _ in range(5)
    ]
    gif_bytes = encode_gif(frames, GRAY, delays_cs=20)
    df = spark.createDataFrame(
        [(0, bytearray(gif_bytes)), (1, b"raw bytes!")],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.video_meta for r in with_video_metadata(df).collect()
    }
    assert (out[0].width, out[0].height, out[0].n_frames) == (9, 7, 5)
    assert out[0].fps == 5.0  # 100 / 20 cs
    assert abs(out[0].duration_sec - 1.0) < 1e-12
    assert out[1].n_frames == 8 + 10 % 8 and out[1].fps == 24.0


def test_sample_video_frames_real_gif_path(spark):
    text = "".join(chr(33 + (i * 7) % 90) for i in range(80))  # 5 frames
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    gif = df.select(
        "doc_id", encode_text_gif(F.col("text")).alias("content")
    )
    rows = sorted(
        sample_video_frames(gif, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    raw = np.frombuffer(text.encode(), dtype=np.uint8)
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        frame = raw[r.frame_idx * 16 : (r.frame_idx + 1) * 16]
        assert r.frame_key == int(frame.sum())
        assert abs(r.ts_sec - r.frame_idx * 5 / 100.0) < 1e-12


def test_encode_text_gif_short_text_null(spark):
    df = spark.createDataFrame(
        [(0, "short"), (1, "x" * 16)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", encode_text_gif(F.col("text")).alias("g")
        ).collect()
    }
    assert rows[0] is None and is_gif(bytes(rows[1]))
