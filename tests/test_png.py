"""Real image decode without Pillow: PNG codec, JPEG header/EXIF, and
the upgraded image-UDF backends (reference `02_Data Ingest.py:137-252`
semantics; the fake decoder is now only the non-PNG/JPEG fallback)."""

import struct
import zlib

import numpy as np
import pytest

from computer_vision_foundations_spark.functions import png as P
from computer_vision_foundations_spark.functions.image import (
    _metadata_one,
    _pixel_statistics,
    _statistics_one,
)


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------- codec


@pytest.mark.parametrize("shape", [(5, 7), (8, 6, 3), (4, 4, 4), (3, 9, 2), (1, 1)])
def test_png_roundtrip_all_color_types(shape):
    a = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    d = P.decode_png(P.encode_png(a))
    exp = a[:, :, None] if a.ndim == 2 else a
    assert np.array_equal(d["pixels"], exp)


def test_png_dpi_phys_roundtrip():
    a = _rng().integers(0, 256, size=(4, 4), dtype=np.uint8)
    d = P.decode_png(P.encode_png(a, dpi=(72, 96)))
    assert d["dpi"] == [72, 96]
    assert P.png_info(P.encode_png(a, dpi=(300, 300)))["dpi"] == [300, 300]


def _forward_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Reference forward filter (per PNG spec) to build decode fixtures
    exercising Sub/Up/Average/Paeth paths the encoder never emits."""
    h, w, nch = arr.shape
    stride = w * nch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = b""
    for y in range(h):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        enc = bytearray()
        for x in range(stride):
            a = int(row[x - nch]) if x >= nch else 0
            b = int(prev[x])
            c = int(prev[x - nch]) if (x >= nch and y > 0) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                pred = P._paeth(a, b, c)
            enc.append((int(row[x]) - pred) & 0xFF)
        out += bytes([ftype]) + bytes(enc)
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_every_filter_type(ftype):
    arr = _rng().integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(_forward_filter(arr, ftype)))
        + P._chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(blob)["pixels"], arr)


def test_png_palette_expansion():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte.tobytes())
        + P._chunk(b"IDAT", zlib.compress(rows))
        + P._chunk(b"IEND", b"")
    )
    d = P.decode_png(blob)
    assert d["mode"] == "P"
    assert np.array_equal(d["pixels"], plte[idx])
    assert P.png_info(blob) == {
        "width": 2, "height": 2, "mode": "P", "layers": 1, "dpi": [0, 0],
    }


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        P.decode_png(b"not a png")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError):
        P.decode_png(blob)


# ----------------------------------------------------------- jpeg/exif

_EXIF = {
    "Make": "Canon", "Model": "EOS-1", "Orientation": 1,
    "XResolution": (72, 1), "YResolution": (72, 1),
    "DateTime": "2020:01:02 03:04:05",
    "ExposureTime": (1, 200), "FNumber": (28, 10), "ISOSpeedRatings": 400,
    "DateTimeOriginal": "2020:01:02 03:04:05", "FocalLength": (50, 1),
    "ColorSpace": 1, "ExifImageWidth": 64, "ExifImageHeight": 48,
    "GPSInfo": {
        "GPSLatitudeRef": "N", "GPSLongitudeRef": "E",
        "GPSDateStamp": "2020:01:02",
    },
}


@pytest.mark.parametrize("bo", ["<", ">"])
def test_jpeg_exif_roundtrip_both_byte_orders(bo):
    blob = P.build_jpeg_exif(_EXIF, width=64, height=48, byte_order=bo)
    assert P.parse_jpeg_header(blob) == {
        "height": 48, "width": 64, "layers": 3, "mode": "RGB",
    }
    got = P.parse_jpeg_exif(blob)
    assert got["Make"] == "Canon"
    assert got["ExposureTime"] == "1/200"
    assert got["FNumber"] == "14/5"  # rational reduced by gcd
    assert got["XResolution"] == "72"
    assert got["ISOSpeedRatings"] == "400"
    assert got["GPSInfo"] == _EXIF["GPSInfo"]


def test_jpeg_exif_absent_is_empty():
    assert P.parse_jpeg_exif(b"\xff\xd8\xff\xd9") == {}
    assert P.parse_jpeg_exif(b"PK\x03\x04") == {}


# --------------------------------------------- UDF backends (no spark)


def test_metadata_real_png_backend():
    a = _rng().integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    m = _metadata_one(P.encode_png(a, dpi=(144, 144)))
    assert (m["height"], m["width"], m["layers"]) == (6, 9, 3)
    assert m["mode"] == "RGB" and m["format"] == "PNG"
    assert m["dpi"] == [144, 144]


def test_metadata_real_jpeg_backend():
    blob = P.build_jpeg_exif(_EXIF, width=40, height=30)
    m = _metadata_one(blob)
    assert (m["height"], m["width"], m["mode"], m["format"]) == (
        30, 40, "RGB", "JPEG",
    )
    assert m["dpi"] == [72, 72]  # pulled from EXIF XResolution
    assert m["exif"]["Make"] == "Canon"
    assert m["exif"]["GPSInfo"]["GPSLatitudeRef"] == "N"


def test_statistics_real_png_values():
    """Statistics from PNG bytes are REAL pixel stats (numpy ground
    truth), not the byte-derived fake."""
    a = _rng().integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    s = _statistics_one(P.encode_png(a))
    for b in range(3):
        band = a[:, :, b].astype(np.float64)
        assert s["mean"][b] == pytest.approx(band.mean())
        assert s["stddev"][b] == pytest.approx(band.std())
        assert s["extrema"][b] == [int(band.min()), int(band.max())]
    assert len(s["histogram"]) == 768  # 256 bins × 3 bands, like PIL
    assert sum(s["histogram"]) == 16 * 16 * 3


def test_statistics_median_matches_pil_rule():
    """PIL ImageStat median = smallest level with cumulative > n//2."""
    a = np.array([[0, 0], [10, 255]], dtype=np.uint8)
    s = _pixel_statistics(P.decode_png(P.encode_png(a))["pixels"])
    # n=4, half=2; cum at 0 is 2 (not > 2), at 10 is 3 (> 2) -> 10
    assert s["median"] == [10]


def test_statistics_entropy_uniform():
    a = np.arange(256, dtype=np.uint8).reshape(16, 16)
    s = _statistics_one(P.encode_png(a))
    assert s["entropy"] == pytest.approx(8.0)
    assert s["histogram"] == [1] * 256


def test_image_dhash_properties():
    from computer_vision_foundations_spark.functions.image import _dhash_one

    a = _rng().integers(0, 256, size=(8, 9), dtype=np.uint8)
    h1 = _dhash_one(P.encode_png(a))
    assert len(h1) == 16 and h1 == _dhash_one(P.encode_png(a))
    # flipping one comparison flips few bits
    b = a.copy()
    b[0, 0] = 255 - b[0, 0]
    h2 = _dhash_one(P.encode_png(b))
    ham = bin(int(h1, 16) ^ int(h2, 16)).count("1")
    assert 0 <= ham <= 2
    # resize path: larger image still hashes (8x9 grid via area mean)
    big = _rng().integers(0, 256, size=(64, 72, 3), dtype=np.uint8)
    h3 = _dhash_one(P.encode_png(big))
    assert len(h3) == 16
    # garbage bytes -> None
    assert _dhash_one(b"not an image") is None
