"""Dependency-free image byte codecs: PNG decode/encode + JPEG headers.

The reference's enrichment UDFs decode images with Pillow
(`02_Data Ingest.py:137-204,223-252`); this container has no Pillow,
and round-2 shipped a documented deterministic *fake* decoder so the
Spark plumbing stayed testable. This module closes most of that gap
with real parsers built only on the stdlib (``zlib``, ``struct``) and
numpy:

- ``decode_png`` / ``encode_png``: a real PNG codec (bit depth 8,
  color types gray/RGB/palette/gray+alpha/RGBA, filters 0-4, pHYs
  DPI). Pixel statistics computed from it are REAL statistics.
- ``parse_jpeg_header``: JPEG SOF scan for (height, width, layers,
  mode) without entropy decode — exactly the metadata the reference's
  ``get_image_metadata`` reports.
- ``parse_jpeg_exif`` / ``build_jpeg_exif``: APP1/TIFF IFD EXIF
  reader and a fixture builder (IFD0 + Exif sub-IFD + GPS IFD, both
  byte orders), mirroring the tag set the reference synthesizes its
  EXIF schema from (`02_Data Ingest.py:111-132`).

Scale note: these run inside Arrow-batched pandas UDFs
(``functions/image.py``); per-image Python-loop unfiltering is fine at
fixture scale and documented — a production deployment swaps in Pillow
(the ``HAVE_PIL`` fast path) without touching any Spark plumbing.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

__all__ = [
    "decode_png",
    "encode_png",
    "parse_jpeg_header",
    "parse_jpeg_exif",
    "build_jpeg_exif",
    "build_exif_app1",
    "png_info",
    "is_png",
    "is_jpeg",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunks(data: bytes):
    if not is_png(data):
        raise ValueError("not a PNG byte stream")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            break


def decode_png(data: bytes, *, apply_palette: bool = True) -> dict:
    """Decode a PNG into real pixels.

    Returns ``{"pixels": ndarray(h, w, channels) uint8, "mode": str,
    "dpi": [x, y], "width": int, "height": int}``. Supports bit depth
    8, interlace 0 (the overwhelming default), filters 0-4. Palette
    images are expanded to RGB when ``apply_palette`` (matching how
    statistics over 'P' images are usually wanted); mode still reports
    'P'.
    """
    ihdr = None
    idat: list[bytes] = []
    plte = None
    dpi = [0, 0]
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, depth, ctcode, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, interlace={interlace})"
                )
            if ctcode not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctcode}")
            ihdr = (w, h, ctcode)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"pHYs":
            px, py, unit = struct.unpack(">IIB", body)
            if unit == 1:  # pixels per metre -> dpi
                dpi = [round(px * 0.0254), round(py * 0.0254)]
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ctcode = ihdr
    nch = _PNG_CHANNELS[ctcode]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = bytearray(raw[row_off + 1 : row_off + 1 + stride])
        if ftype == 0:
            cur = np.frombuffer(bytes(line), dtype=np.uint8)
        elif ftype == 2:  # Up — vectorizable
            cur = (np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(
                np.uint8
            )
        else:  # Sub/Average/Paeth depend on the left neighbour: scan x
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                b = int(prev[x])
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    c = int(prev[x - nch]) if x >= nch else 0
                    line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
            cur = np.frombuffer(bytes(line), dtype=np.uint8)
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, nch)
    if ctcode == 3 and apply_palette:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return {
        "pixels": px,
        "mode": _PNG_MODE[ctcode],
        "dpi": dpi,
        "width": w,
        "height": h,
    }


def png_info(data: bytes) -> dict:
    """Header-only metadata (width/height/mode/layers/dpi) — no pixel
    decode, so metadata extraction stays cheap on large images."""
    out = None
    dpi = [0, 0]
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, _depth, ctcode, _c, _f, _i = struct.unpack(">IIBBBBB", body)
            out = {
                "width": w,
                "height": h,
                "mode": _PNG_MODE.get(ctcode, f"CT{ctcode}"),
                "layers": _PNG_CHANNELS.get(ctcode, 1),
            }
        elif ctype == b"pHYs":
            px, py, unit = struct.unpack(">IIB", body)
            if unit == 1:
                dpi = [round(px * 0.0254), round(py * 0.0254)]
        elif ctype == b"IDAT":
            break
    if out is None:
        raise ValueError("PNG missing IHDR")
    out["dpi"] = dpi
    return out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, *, dpi: tuple[int, int] | None = None) -> bytes:
    """Encode uint8 pixels (h,w) or (h,w,{1,2,3,4}) as a filter-0 PNG."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ctcode = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctcode, 0, 0, 0)
    rows = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if dpi is not None:
        ppm = (round(dpi[0] / 0.0254), round(dpi[1] / 0.0254))
        out += _chunk(b"pHYs", struct.pack(">IIB", ppm[0], ppm[1], 1))
    out += _chunk(b"IDAT", zlib.compress(rows, 6)) + _chunk(b"IEND", b"")
    return out


# --------------------------------------------------------------- JPEG

# Tag id -> name, the subset the engine's EXIF schema pins
# (functions/image.py _EXIF_TAGS_SNAPSHOT ∪ what the reference's PIL
# loop would surface for these fixtures).
_TIFF_TAGS = {
    0x0100: "ImageWidth",
    0x0101: "ImageLength",
    0x0102: "BitsPerSample",
    0x0103: "Compression",
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x011A: "XResolution",
    0x011B: "YResolution",
    0x0128: "ResolutionUnit",
    0x0131: "Software",
    0x0132: "DateTime",
    0x829A: "ExposureTime",
    0x829D: "FNumber",
    0x8827: "ISOSpeedRatings",
    0x9003: "DateTimeOriginal",
    0x920A: "FocalLength",
    0xA001: "ColorSpace",
    0xA002: "ExifImageWidth",
    0xA003: "ExifImageHeight",
}
_EXIF_POINTER = 0x8769
_GPS_POINTER = 0x8825
_GPS_TAGS = {
    0x0000: "GPSVersionID",
    0x0001: "GPSLatitudeRef",
    0x0002: "GPSLatitude",
    0x0003: "GPSLongitudeRef",
    0x0004: "GPSLongitude",
    0x0005: "GPSAltitudeRef",
    0x0006: "GPSAltitude",
    0x0007: "GPSTimeStamp",
    0x001D: "GPSDateStamp",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 10: 8}


def _fmt_rational(num: int, den: int) -> str:
    if den == 0:
        return "nan"
    if num % den == 0:
        return str(num // den)
    g = math.gcd(num, den)
    return f"{num // g}/{den // g}"


def _read_ifd(tiff: bytes, off: int, bo: str, tags: dict[int, str]) -> tuple[dict, dict]:
    """One IFD: returns ({name: str_value}, {pointer_tag: offset})."""
    out: dict[str, str] = {}
    pointers: dict[int, int] = {}
    if off + 2 > len(tiff):
        return out, pointers
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, vtype, count = struct.unpack_from(bo + "HHI", tiff, base)
        size = _TYPE_SIZE.get(vtype, 1) * count
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, base + 8)
        if tag in (_EXIF_POINTER, _GPS_POINTER):
            (ptr,) = struct.unpack_from(bo + "I", tiff, base + 8)
            pointers[tag] = ptr
            continue
        name = tags.get(tag)
        if name is None:
            continue
        if vtype == 2:  # ASCII
            raw = tiff[voff : voff + count].split(b"\x00")[0]
            out[name] = raw.decode("ascii", "replace")
        elif vtype in (3, 4):
            fmt = "H" if vtype == 3 else "I"
            vals = [
                struct.unpack_from(bo + fmt, tiff, voff + _TYPE_SIZE[vtype] * j)[0]
                for j in range(count)
            ]
            out[name] = str(vals[0]) if count == 1 else str(tuple(vals))
        elif vtype in (5, 10):
            fmt = "II" if vtype == 5 else "ii"
            vals = [
                _fmt_rational(
                    *struct.unpack_from(bo + fmt, tiff, voff + 8 * j)
                )
                for j in range(count)
            ]
            out[name] = vals[0] if count == 1 else str(tuple(vals))
        elif vtype in (1, 7):
            out[name] = str(tuple(tiff[voff : voff + count]))
    return out, pointers


def parse_jpeg_exif(data: bytes) -> dict:
    """EXIF dict from a JPEG's APP1 segment (IFD0 + Exif IFD + GPS).

    Returns ``{name: str, ..., "GPSInfo": {gps_name: str}}`` — the
    shape ``functions/image.py`` folds into its EXIF struct column.
    Empty dict when no APP1/Exif marker exists.
    """
    if not is_jpeg(data):
        return {}
    pos = 2
    tiff = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        if marker == 0xDA:  # start of scan — no APP1 before it
            break
        pos += 2 + seglen
    if tiff is None or len(tiff) < 8:
        return {}
    bo = "<" if tiff[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    exif, pointers = _read_ifd(tiff, ifd0_off, bo, _TIFF_TAGS)
    if _EXIF_POINTER in pointers:
        sub, _ = _read_ifd(tiff, pointers[_EXIF_POINTER], bo, _TIFF_TAGS)
        exif.update(sub)
    if _GPS_POINTER in pointers:
        gps, _ = _read_ifd(tiff, pointers[_GPS_POINTER], bo, _GPS_TAGS)
        if gps:
            exif["GPSInfo"] = gps
    return exif


def parse_jpeg_header(data: bytes) -> dict | None:
    """(height, width, layers, mode) from the first SOF marker —
    metadata without entropy decode. None if no SOF found."""
    if not is_jpeg(data):
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            body = data[pos + 4 : pos + 2 + seglen]
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            mode = {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, f"C{ncomp}")
            return {"height": h, "width": w, "layers": ncomp, "mode": mode}
        if marker == 0xDA:
            break
        pos += 2 + seglen
    return None


# --------------------------------------------------- fixture builders

_NAME_TO_TAG = {v: k for k, v in _TIFF_TAGS.items()}
_NAME_TO_GPS = {v: k for k, v in _GPS_TAGS.items()}
_IFD0_NAMES = {
    "Make", "Model", "Orientation", "XResolution", "YResolution",
    "ResolutionUnit", "Software", "DateTime", "ImageWidth", "ImageLength",
}


def _pack_ifd(entries: list[tuple[int, int, int, bytes]], tiff_off: int, bo: str) -> tuple[bytes, bytes]:
    """entries: (tag, vtype, count, payload). Returns (ifd_bytes, tail)
    where values >4 bytes land in tail at offsets after the IFD."""
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    tail = b""
    body = struct.pack(bo + "H", n)
    for tag, vtype, count, payload in sorted(entries):
        body += struct.pack(bo + "HHI", tag, vtype, count)
        if len(payload) <= 4:
            body += payload.ljust(4, b"\x00")
        else:
            body += struct.pack(bo + "I", tiff_off + ifd_size + len(tail))
            tail += payload
    body += struct.pack(bo + "I", 0)  # next-IFD pointer
    return body, tail


def _entry(bo: str, tag: int, value) -> tuple[int, int, int, bytes]:
    if isinstance(value, str):
        raw = value.encode("ascii") + b"\x00"
        return (tag, 2, len(raw), raw)
    if isinstance(value, tuple) and len(value) == 2 and all(
        isinstance(v, int) for v in value
    ):  # rational
        return (tag, 5, 1, struct.pack(bo + "II", *value))
    if isinstance(value, int):
        return (tag, 3, 1, struct.pack(bo + "H", value))
    raise TypeError(f"unsupported fixture EXIF value {value!r}")


def build_exif_app1(exif: dict, *, byte_order: str = "<") -> bytes:
    """Raw APP1 payload (``Exif\\0\\0`` + TIFF blob) for an EXIF dict —
    IFD0, Exif sub-IFD, optional GPS IFD in genuine TIFF layout.
    Feed to ``jpeg.encode_jpeg(app1=...)`` for renderable fixtures, or
    use ``build_jpeg_exif`` for a header-only blob."""
    bo = byte_order
    gps = exif.get("GPSInfo") or {}
    ifd0_vals = {k: v for k, v in exif.items() if k in _IFD0_NAMES}
    sub_vals = {
        k: v
        for k, v in exif.items()
        if k not in _IFD0_NAMES and k != "GPSInfo" and k in _NAME_TO_TAG
    }

    # Lay out: header(8) | IFD0 | ifd0-tail | [ExifIFD | tail] | [GPS | tail]
    def sized(entries, off):
        b, t = _pack_ifd(entries, off, bo)
        return b + t

    ifd0_entries = [_entry(bo, _NAME_TO_TAG[k], v) for k, v in ifd0_vals.items()]
    n_ptr = (1 if sub_vals else 0) + (1 if gps else 0)
    # reserve pointer slots with dummy offsets, fix after sizing
    probe = ifd0_entries + [
        (_EXIF_POINTER, 4, 1, struct.pack(bo + "I", 0))
    ] * (1 if sub_vals else 0) + [
        (_GPS_POINTER, 4, 1, struct.pack(bo + "I", 0))
    ] * (1 if gps else 0)
    ifd0_off = 8
    ifd0_full = sized(probe, ifd0_off)
    sub_off = ifd0_off + len(ifd0_full)
    sub_full = b""
    if sub_vals:
        sub_entries = [_entry(bo, _NAME_TO_TAG[k], v) for k, v in sub_vals.items()]
        sub_full = sized(sub_entries, sub_off)
    gps_off = sub_off + len(sub_full)
    gps_full = b""
    if gps:
        gps_entries = [_entry(bo, _NAME_TO_GPS[k], v) for k, v in gps.items()]
        gps_full = sized(gps_entries, gps_off)
    final_entries = list(ifd0_entries)
    if sub_vals:
        final_entries.append((_EXIF_POINTER, 4, 1, struct.pack(bo + "I", sub_off)))
    if gps:
        final_entries.append((_GPS_POINTER, 4, 1, struct.pack(bo + "I", gps_off)))
    ifd0_full = sized(final_entries, ifd0_off)

    tiff = (
        (b"II" if bo == "<" else b"MM")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", 8)
        + ifd0_full
        + sub_full
        + gps_full
    )
    return b"Exif\x00\x00" + tiff


def build_jpeg_exif(
    exif: dict,
    *,
    width: int = 64,
    height: int = 48,
    byte_order: str = "<",
) -> bytes:
    """A minimal JPEG byte blob: SOI + APP1(Exif) + SOF0 + EOI.

    Carries real EXIF structure (IFD0, Exif sub-IFD, optional GPS IFD)
    so ``parse_jpeg_exif`` fixtures exercise genuine TIFF layout in
    both byte orders. Not a renderable image (no scan data) — header
    metadata and EXIF only, which is all the metadata UDF reads.
    """
    app1 = build_exif_app1(exif, byte_order=byte_order)
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )
