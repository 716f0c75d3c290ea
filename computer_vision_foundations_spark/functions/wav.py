"""RIFF/WAVE codec from scratch — no audio libraries.

Upgrades the engine's audio modality (``functions/media.py``) from the
deterministic fake to REAL decode for the most common uncompressed
container: canonical WAV (RIFF little-endian, ``fmt `` chunk with
``wFormatTag = 1`` integer PCM, 8- or 16-bit, any channel count). The
format is public knowledge (Microsoft/IBM Multimedia Programming
Interface spec, 1991; RIFF chunk grammar) and the implementation here
is hand-rolled struct packing over numpy buffers — the same
dependency-free-codec approach as ``functions/png.py`` and
``functions/jpeg.py``.

Reference parity: the reference treats media as opaque binary columns
plus typed metadata structs (`02_Data Ingest.py:191-199` declares the
image flavor); this module provides the audio twin with a real codec
so metadata and sample statistics come from actual decoded PCM.

Scale shape: pure per-row byte work — every caller wraps it in an
Arrow-batched UDF (narrow projection, no shuffle; see
``media.with_audio_metadata`` / ``media.wav_window_stats``).

Encoding contract (pinned by tests):
- 16-bit: little-endian signed ``int16`` samples, interleaved by
  channel, exactly as produced — ``decode_wav(encode_wav(x)) == x``.
- 8-bit: unsigned bytes stored excess-128 (WAV convention); decode
  re-centers to signed values so both widths decode to the same
  numeric space.
- Chunk walk skips unknown chunks (LIST/INFO/fact/...) with the RIFF
  word-alignment pad byte, so files from other writers parse too.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "is_wav",
    "encode_wav",
    "decode_wav",
    "wav_metadata",
    "resample_x2_linear",
]


def is_wav(data: bytes) -> bool:
    """True when the buffer carries the RIFF/WAVE magic."""
    return (
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000, bits: int = 16
) -> bytes:
    """Serialize integer PCM as a canonical WAV file.

    ``samples``: shape ``(n,)`` mono or ``(n, channels)``; integer
    values in the width's range (int16 for 16-bit, signed -128..127
    for 8-bit — stored excess-128 per the WAV convention).
    """
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits} (8 or 16)")
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    else:
        payload = (arr.astype(np.int64) + 128).astype(np.uint8).tobytes()
    block_align = ch * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _validate_fmt(
    audio_format: int, ch: int, sample_rate: int, bits: int
) -> None:
    """Shared header validation for decode_wav AND wav_metadata, so
    the metadata and stats UDFs can never disagree on whether a blob
    is decodable (and zero channels/rates can't divide-by-zero)."""
    if audio_format != 1:
        raise ValueError(f"unsupported wFormatTag {audio_format} (PCM only)")
    if ch < 1:
        raise ValueError(f"invalid channel count {ch}")
    if sample_rate < 1:
        raise ValueError(f"invalid sample rate {sample_rate}")
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits}")


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a WAV file → ``(samples, sample_rate, bits)``.

    ``samples`` is ``int32`` of shape ``(n, channels)``; 8-bit input
    is re-centered (−128) so both widths share one numeric space.
    Walks the RIFF chunk list, skipping unknown chunks with the
    word-alignment pad, and requires a PCM ``fmt `` chunk before
    ``data``.
    """
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    fmt = None
    payload = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
            if fmt is not None:
                break
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    _validate_fmt(audio_format, ch, sample_rate, bits)
    if bits == 16:
        flat = np.frombuffer(
            payload[: len(payload) // (2 * ch) * 2 * ch], dtype="<i2"
        ).astype(np.int32)
    elif bits == 8:
        flat = (
            np.frombuffer(
                payload[: len(payload) // ch * ch], dtype=np.uint8
            ).astype(np.int32)
            - 128
        )
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return flat.reshape(-1, ch), sample_rate, bits


def wav_metadata(data: bytes) -> tuple[int, int, int]:
    """Header-only parse → ``(sample_rate, n_channels, n_samples)``.

    Reads the ``fmt `` chunk and the ``data`` chunk SIZE without
    touching the payload bytes — the cheap path for metadata columns.
    """
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    fmt = None
    data_size = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif cid == b"data":
            data_size = min(size, end - pos - 8)
            if fmt is not None:
                break
        pos += 8 + size + (size % 2)
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    _validate_fmt(audio_format, ch, sample_rate, bits)
    n_samples = data_size // (ch * (bits // 8))
    return sample_rate, ch, n_samples


def resample_x2_linear(samples: np.ndarray) -> np.ndarray:
    """Integer-exact 2× upsample: even outputs copy the input, odd
    outputs are the floor-midpoint of neighbors (last sample repeats).
    Shape ``(n, ch)`` → ``(2n, ch)``. Kept integer (floor division) so
    a SQL oracle can replay it sample-for-sample."""
    arr = np.asarray(samples, dtype=np.int64)
    one_d = arr.ndim == 1
    if one_d:
        arr = arr[:, None]
    n, ch = arr.shape
    out = np.empty((2 * n, ch), dtype=np.int64)
    out[0::2] = arr
    if n > 1:
        mids = (arr[:-1] + arr[1:]) // 2
        out[1:-1:2] = mids
    if n:
        out[-1] = arr[-1]
    return out[:, 0] if one_d else out
