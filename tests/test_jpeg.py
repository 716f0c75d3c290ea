"""Baseline JPEG codec (functions/jpeg.py): round trips, markers,
restart intervals, subsampling, and the flat-block exactness property
the q22 oracle depends on."""

import numpy as np
import pytest

from computer_vision_foundations_spark.functions import png as P
from computer_vision_foundations_spark.functions.jpeg import decode_jpeg, encode_jpeg


def test_flat_blocks_exact_at_q100():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 256, 9, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(3, 3), 8, 0), 8, 1)
    d = decode_jpeg(encode_jpeg(img, quality=100))
    assert d["mode"] == "L"
    assert np.array_equal(d["pixels"], img)


def test_gray_noise_q100_within_rounding():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=100))
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 1  # all-ones quant: only float/round noise


def test_gray_gradient_q90_close():
    x = np.linspace(0, 255, 64)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=100))
    assert d["mode"] == "RGB" and d["pixels"].shape == img.shape
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 3  # color-convert rounding both ways


def test_rgb_420_subsampled_smooth():
    img = np.zeros((32, 48, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 48).astype(np.uint8)[None, :]
    img[..., 1] = 120
    img[..., 2] = np.linspace(255, 0, 32).astype(np.uint8)[:, None]
    d = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420"))
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert d["pixels"].shape == img.shape
    assert err.mean() < 4  # chroma replicated 2x2; smooth image


def test_restart_interval_roundtrip():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    b = encode_jpeg(img, quality=100, restart_interval=3)
    assert b"\xff\xdd" in b  # DRI emitted
    d = decode_jpeg(b)
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 1


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=100))
    assert d["pixels"].shape == (13, 21)
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 1


def test_header_and_exif_interop_with_png_module():
    exif = {"Make": "CamCo", "Model": "X1", "GPSInfo": {"GPSLatitudeRef": "N"}}
    app1 = P.build_exif_app1(exif)
    img = np.full((16, 24), 40, np.uint8)
    b = encode_jpeg(img, quality=95, app1=app1, dpi=(72, 72))
    hdr = P.parse_jpeg_header(b)
    assert hdr == {"height": 16, "width": 24, "layers": 1, "mode": "L"}
    parsed = P.parse_jpeg_exif(b)
    assert parsed["Make"] == "CamCo"
    assert parsed["GPSInfo"] == {"GPSLatitudeRef": "N"}


def test_progressive_stub_without_scan_rejected():
    # SOF2 is decodable since round 4, but a stub with no SOS must
    # still raise, not mis-decode
    blob = b"\xff\xd8\xff\xc2" + b"\x00\x0b" + bytes(9) + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(blob)


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_image_udf_internals_use_real_jpeg_decode():
    from computer_vision_foundations_spark.functions import image as I

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    b = encode_jpeg(img, quality=100)
    s = I._statistics_one(b)
    # q100 decode is within ±1 per pixel: mean must track the true mean
    assert abs(s["mean"][0] - img.mean()) < 0.2
    assert s["extrema"][0][0] >= int(img.min()) - 1
    assert len(s["histogram"]) == 256
    m = I._metadata_one(b)
    assert m["format"] == "JPEG" and (m["height"], m["width"]) == (24, 24)
    assert I._dhash_one(b) is not None


def test_rgb_statistics_three_bands():
    from computer_vision_foundations_spark.functions import image as I

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    s = I._statistics_one(encode_jpeg(img, quality=100))
    assert len(s["mean"]) == 3 and len(s["histogram"]) == 768
    for band in range(3):
        assert abs(s["mean"][band] - img[..., band].mean()) < 1.5


def test_rgb_422_subsampled_smooth():
    img = np.zeros((24, 40, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 40).astype(np.uint8)[None, :]
    img[..., 1] = 80
    img[..., 2] = 160
    d = decode_jpeg(encode_jpeg(img, quality=92, subsampling="422"))
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert d["pixels"].shape == img.shape
    assert err.mean() < 3  # chroma halved horizontally only


def test_non_interleaved_scan_rejected():
    # craft: valid gray encode, then rewrite SOF to claim 3 components
    # while SOS still declares 1 -> decoder must raise, not return Y
    img = np.full((8, 8), 50, np.uint8)
    b = bytearray(encode_jpeg(img, quality=90))
    i = bytes(b).find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nf(1) comps...
    nf_pos = i + 2 + 2 + 1 + 2 + 2
    b[nf_pos] = 3
    b[i + 3] = 8 + 3 * 3  # new segment length
    # append two fake component specs after the existing one
    comp_end = nf_pos + 1 + 3
    b[comp_end:comp_end] = bytes([2, 0x11, 0, 3, 0x11, 0])
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(bytes(b))


def test_dhash_returns_none_on_undeclared_table_ids():
    from computer_vision_foundations_spark.functions.image import _dhash_one

    img = np.full((8, 8), 90, np.uint8)
    b = bytearray(encode_jpeg(img, quality=90))
    # point the SOS at Huffman table id 3 (never declared) -> KeyError
    # path. SOS layout: FF DA len(2) ns(1) cid(1) TABS(1) ...
    i = bytes(b).find(b"\xff\xda")
    b[i + 6] = 0x33
    assert _dhash_one(bytes(b)) is None


def test_progressive_roundtrip_equals_baseline():
    """Progressive transmission reorders the SAME quantized
    coefficients, so decode(progressive) must equal decode(baseline)
    bit-for-bit — across shapes, modes, and subsampling (exercises
    spectral selection, EOB runs, ZRL-in-refinement, and both DC/AC
    successive-approximation passes)."""
    import numpy as np

    rng = np.random.default_rng(7)
    cases = [
        ((8, 8), "444"),
        ((24, 17), "444"),
        ((33, 29, 3), "444"),
        ((24, 24, 3), "420"),
        ((37, 23, 3), "420"),
        ((48, 31, 3), "422"),
    ]
    for shape, sub in cases:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        kw = {"quality": 85}
        if len(shape) == 3:
            kw["subsampling"] = sub
        base = decode_jpeg(encode_jpeg(px, **kw))
        prog = decode_jpeg(encode_jpeg(px, progressive=True, **kw))
        assert prog["mode"] == base["mode"]
        assert np.array_equal(prog["pixels"], base["pixels"]), (shape, sub)


def test_progressive_sparse_and_flat_blocks():
    """Mostly-flat images drive long EOB runs and zero bands; a single
    hot block drives ZRL paths in both first and refinement passes."""
    import numpy as np

    px = np.full((40, 40), 128, dtype=np.uint8)
    px[8:16, 8:16] = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    base = decode_jpeg(encode_jpeg(px, quality=60))
    prog = decode_jpeg(encode_jpeg(px, quality=60, progressive=True))
    assert np.array_equal(prog["pixels"], base["pixels"])


def test_progressive_quality_sweep():
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(19, 26, 3), dtype=np.uint8)
    for q in (35, 75, 95, 100):
        base = decode_jpeg(encode_jpeg(px, quality=q))
        prog = decode_jpeg(encode_jpeg(px, quality=q, progressive=True))
        assert np.array_equal(prog["pixels"], base["pixels"]), q


def test_progressive_with_exif_metadata_chain():
    """image_statistics/image_metadata must treat a progressive JPEG as
    a real decode now (no fake fallback) and still read its EXIF."""
    import numpy as np

    from computer_vision_foundations_spark.functions import png as P

    px = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48) % 251
    app1 = P.build_exif_app1({"Make": "ProgCam", "Model": "P1"})
    blob = encode_jpeg(px, quality=90, progressive=True, app1=app1)
    out = decode_jpeg(blob)
    assert out["pixels"].shape == (48, 48)
    assert P.parse_jpeg_exif(blob)["Make"] == "ProgCam"


def test_progressive_restart_rejected_in_encoder():
    import numpy as np

    with pytest.raises(ValueError):
        encode_jpeg(
            np.zeros((8, 8), dtype=np.uint8),
            restart_interval=2,
            progressive=True,
        )
