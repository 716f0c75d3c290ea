"""Audio / video multimodal columns: opaque binary + typed metadata.

Extends the engine's multimodal model (SURVEY §1.2: media as opaque
``binary`` columns + typed metadata structs + flat tensor arrays —
the same shape the reference uses for images, `02_Data
Ingest.py:191-199`) to audio and video. All processing is
Arrow-batched (iterator ``pandas_udf`` / ``mapInPandas``): the JVM⇄
Python hop moves columnar buffers, and every operator is a NARROW
transformation — no shuffle; batches are decoded where they sit.

Decode backend:
- Real decoders (soundfile / PyAV) are not in this container; imports
  are gated and ``HAVE_AUDIO_CODEC`` / ``HAVE_VIDEO_CODEC`` report
  availability. Swap-in is one function each (``_decode_audio_real``,
  ``_decode_video_real``).
- Without them, DETERMINISTIC FAKE decoders stand in, defined on the
  raw bytes with integer-exact arithmetic so the fakes themselves are
  differentially testable: a SQL engine can replay them over ASCII
  payloads (see q39/q40), and the Spark-side plumbing — schemas,
  Arrow batch shapes, explode layout, partitioning — is fully real.

Fake semantics (documented contract, pinned by tests and oracles):
- audio: PCM = unsigned bytes centered at 128; frame energy =
  Σ (byte−128) over each non-overlapping window (integer).
- video: n_frames = 8 + len(bytes) mod 8, fps = 24; frame i samples
  the byte at offset ⌊i·len/n_frames⌋ as its key.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not in this container
    import soundfile  # type: ignore  # noqa: F401

    HAVE_AUDIO_CODEC = True
except ImportError:
    HAVE_AUDIO_CODEC = False

try:  # pragma: no cover - not in this container
    import av  # type: ignore  # noqa: F401

    HAVE_VIDEO_CODEC = True
except ImportError:
    HAVE_VIDEO_CODEC = False

FAKE_SAMPLE_RATE = 16_000
FAKE_FPS = 24.0

AUDIO_METADATA_TYPE = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)

VIDEO_METADATA_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def _pcm_from_bytes(content: bytes) -> np.ndarray:
    """FAKE audio decode: bytes → int64 PCM centered at 128."""
    if not content:
        return np.zeros(0, dtype=np.int64)
    return np.frombuffer(content, dtype=np.uint8).astype(np.int64) - 128


def _decode_any_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Decode → ``(mono int64 PCM, sample_rate)``.

    RIFF/WAVE bytes take the REAL codec (``functions/wav.py``; channel
    0 of the decoded PCM — deterministic, no float mixdown); anything
    else falls back to the documented fake so non-audio binaries keep
    their pinned contract. A CORRUPT container (magic present, body
    malformed) also falls back instead of raising: one bad blob must
    not kill a thousand-executor job — the fake path keeps the UDF
    total and deterministic.
    """
    from computer_vision_foundations_spark.functions.wav import (
        decode_wav,
        is_wav,
    )

    if content and is_wav(content):
        try:
            pcm, rate, _bits = decode_wav(content)
            return pcm[:, 0].astype(np.int64), rate
        except (ValueError, struct.error):
            pass  # corrupt container: documented fake fallback below
    return _pcm_from_bytes(content), FAKE_SAMPLE_RATE


def _fake_n_frames(n_bytes: int) -> int:
    return 8 + n_bytes % 8


def audio_metadata_udf():
    """Arrow-batched UDF behind ``with_audio_metadata`` (also the SQL
    registration target, see ``register_media_functions``). RIFF/WAVE
    bytes get a REAL header-only parse (``functions/wav.py`` — rate,
    channels, sample count from the fmt/data chunks, payload untouched);
    other bytes keep the documented fake (one sample per byte at
    16 kHz mono)."""
    from computer_vision_foundations_spark.functions.wav import (
        is_wav,
        wav_metadata,
    )

    @F.pandas_udf(AUDIO_METADATA_TYPE)
    def meta(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for contents in it:
            rates, chans, counts = [], [], []
            for b in contents:
                rate = None
                if b and is_wav(bytes(b)):
                    try:
                        rate, ch, n = wav_metadata(bytes(b))
                    except (ValueError, struct.error):
                        rate = None  # corrupt container: fake below
                if rate is None:
                    rate, ch, n = FAKE_SAMPLE_RATE, 1, len(b or b"")
                rates.append(rate)
                chans.append(ch)
                counts.append(n)
            counts_arr = np.asarray(counts, np.int64)
            rates_arr = np.asarray(rates, np.int32)
            yield pd.DataFrame(
                {
                    "sample_rate": rates_arr,
                    "n_channels": np.asarray(chans, np.int32),
                    "n_samples": counts_arr,
                    "duration_sec": counts_arr.astype("float64")
                    / rates_arr.astype("float64"),
                }
            )

    return meta


def with_audio_metadata(
    df: DataFrame, content_col: str = "content", out_col: str = "audio_meta"
) -> DataFrame:
    """Typed audio metadata struct from the binary column (real WAV
    header parse for RIFF bytes, documented fake otherwise — see
    ``audio_metadata_udf``). Narrow, Arrow-batched."""
    return df.withColumn(out_col, audio_metadata_udf()(F.col(content_col)))


def audio_frame_energies(window: int = 64):
    """Arrow-batched UDF: binary → array<long> of per-window energy
    sums (Σ centered-byte over each full non-overlapping window).
    Integer-exact, so a SQL oracle can replay it over ASCII payloads."""

    @F.pandas_udf("array<bigint>")
    def f(contents: pd.Series) -> pd.Series:
        out = []
        for b in contents:
            pcm = _pcm_from_bytes(b)
            n_full = len(pcm) // window
            out.append(
                pcm[: n_full * window].reshape(n_full, window).sum(axis=1)
            )
        return pd.Series(out)

    return f


def wav_window_stats(window: int = 32):
    """Arrow-batched UDF: binary → per-window stats over the REAL
    decoded PCM — ``array<struct<widx:int, energy:bigint, zcr:int,
    peak:int>>`` for each full non-overlapping window of channel 0.

    Integer-exact by construction (energy = Σ s², zcr counts
    within-window sign-bit transitions with ``s >= 0`` as positive,
    peak = max |s|), so a SQL oracle can replay the whole
    encode→decode→stats chain sample-for-sample. Non-WAV bytes use
    the fake byte-PCM, keeping the UDF total.
    """
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("widx", T.IntegerType()),
                T.StructField("energy", T.LongType()),
                T.StructField("zcr", T.IntegerType()),
                T.StructField("peak", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def f(contents: pd.Series) -> pd.Series:
        out = []
        for b in contents:
            pcm, _rate = _decode_any_audio(bytes(b) if b else b"")
            n_full = len(pcm) // window
            w = pcm[: n_full * window].reshape(n_full, window)
            energy = (w * w).sum(axis=1)
            nonneg = w >= 0
            zcr = (nonneg[:, 1:] != nonneg[:, :-1]).sum(axis=1)
            peak = np.abs(w).max(axis=1) if n_full else np.zeros(0, np.int64)
            out.append(
                [
                    {
                        "widx": int(i),
                        "energy": int(energy[i]),
                        "zcr": int(zcr[i]),
                        "peak": int(peak[i]),
                    }
                    for i in range(n_full)
                ]
            )
        return pd.Series(out)

    return f


def encode_text_wav(col, sample_rate: int = 8_000, scale: int = 256):
    """Column helper: UTF-8 text → REAL 16-bit mono WAV bytes, sample
    ``i`` = ``(byte_i − 128) · scale`` (int16-exact for scale ≤ 256).
    The deterministic text→PCM ramp makes the audio chain
    differentially testable: a SQL engine replays the sample math
    straight from characters while Spark runs the full encode→decode
    round trip (the z21/z23 oracles; z23 uses scale=1 to keep DFT
    powers small enough for round-6 float comparison)."""

    @F.pandas_udf("binary")
    def enc(texts: pd.Series) -> pd.Series:
        from computer_vision_foundations_spark.functions.wav import (
            encode_wav,
        )

        out = []
        for t in texts:
            b = (t or "").encode("utf-8")
            pcm = (
                np.frombuffer(b, dtype=np.uint8).astype(np.int64) - 128
            ) * scale
            out.append(
                encode_wav(pcm.astype(np.int16), sample_rate, bits=16)
            )
        return pd.Series(out)

    return enc(col)


def encode_text_gif(col, frame_w: int = 4, frame_h: int = 4,
                    delay_cs: int = 5):
    """Column helper: UTF-8 text → REAL animated GIF89a bytes via the
    from-scratch codec — a grayscale identity palette and one
    ``frame_h×frame_w`` frame per ``frame_h·frame_w`` consecutive
    bytes (remainder dropped), so decoded channel-0 pixels ARE the
    text bytes. The deterministic fixture makes the video chain
    differentially testable: a SQL engine replays the byte math while
    Spark runs the full LZW encode→decode round trip (the z22
    oracle). Texts too short for one frame yield NULL."""
    fpx = frame_w * frame_h

    @F.pandas_udf("binary")
    def enc(texts: pd.Series) -> pd.Series:
        from computer_vision_foundations_spark.functions.gif import (
            encode_gif,
        )

        pal = np.repeat(
            np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
        )
        out = []
        for t in texts:
            b = (t or "").encode("utf-8")
            nf = len(b) // fpx
            if nf == 0:
                out.append(None)
                continue
            raw = np.frombuffer(b[: nf * fpx], dtype=np.uint8)
            frames = [
                raw[i * fpx : (i + 1) * fpx].reshape(frame_h, frame_w)
                for i in range(nf)
            ]
            out.append(encode_gif(frames, pal, delays_cs=delay_cs))
        return pd.Series(out)

    return enc(col)


def video_metadata_udf():
    """Arrow-batched UDF behind ``with_video_metadata`` (also the SQL
    registration target). GIF bytes get a REAL header walk
    (``functions/gif.py`` — dimensions and frame count from the block
    structure, LZW payload skipped via sub-block lengths; fps = 100 /
    first graphic-control delay); other bytes keep the documented fake
    (n_frames = 8 + len mod 8 at 24 fps, 64×64)."""
    from computer_vision_foundations_spark.functions.gif import (
        gif_metadata,
        is_gif,
    )

    @F.pandas_udf(VIDEO_METADATA_TYPE)
    def meta(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for contents in it:
            ws, hs, ns, fps = [], [], [], []
            for b in contents:
                parsed = None
                if b and is_gif(bytes(b)):
                    try:
                        parsed = gif_metadata(bytes(b))
                    except (ValueError, struct.error, IndexError):
                        parsed = None  # corrupt container: fake below
                if parsed is not None:
                    gw, gh, gn, delay = parsed
                    ws.append(gw)
                    hs.append(gh)
                    ns.append(gn)
                    fps.append(100.0 / delay if delay > 0 else FAKE_FPS)
                else:
                    ws.append(64)
                    hs.append(64)
                    ns.append(_fake_n_frames(len(b)) if b is not None else 0)
                    fps.append(FAKE_FPS)
            n = np.asarray(ns, np.int32)
            fps_arr = np.asarray(fps, np.float64)
            yield pd.DataFrame(
                {
                    "width": np.asarray(ws, np.int32),
                    "height": np.asarray(hs, np.int32),
                    "n_frames": n,
                    "fps": fps_arr,
                    "duration_sec": n.astype("float64") / fps_arr,
                }
            )

    return meta


def with_video_metadata(
    df: DataFrame, content_col: str = "content", out_col: str = "video_meta"
) -> DataFrame:
    """Typed video metadata struct from the binary column (real GIF
    header walk for GIF bytes, documented fake otherwise — see
    ``video_metadata_udf``). Narrow, Arrow-batched."""
    return df.withColumn(out_col, video_metadata_udf()(F.col(content_col)))


def register_media_functions(spark) -> None:
    """SQL registration for the audio/video modality so
    ``expr("get_audio_metadata(content)")`` works — the same named-UDF
    surface the reference exposes for images
    (`02_Data Ingest.py:204,252`), extended to the other media types.
    Registers: get_audio_metadata, get_video_metadata,
    audio_frame_energies (window 64), wav_window_stats (window 32)."""
    spark.udf.register("get_audio_metadata", audio_metadata_udf())
    spark.udf.register("get_video_metadata", video_metadata_udf())
    spark.udf.register("audio_frame_energies", audio_frame_energies(64))
    spark.udf.register("wav_window_stats", wav_window_stats(32))


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n: int = 2,
) -> DataFrame:
    """Frame sampling: one output row per kept frame —
    ``(id, frame_idx, ts_sec, frame_key)``, keeping every ``every_n``-th
    frame. ``mapInPandas`` so the fan-out happens inside the plan
    (narrow; no shuffle, no driver involvement); frame_key is the fake
    decoder's sampled byte (with a real codec: the decoded frame
    tensor / its fingerprint).
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_sec", T.DoubleType()),
            T.StructField("frame_key", T.IntegerType()),
        ]
    )

    from computer_vision_foundations_spark.functions.gif import (
        decode_gif,
        is_gif,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, tss, keys = [], [], [], []
            for doc_id, b in zip(batch[id_col], batch[content_col]):
                b = bytes(b) if b else b""
                decoded = None
                if b and is_gif(b):
                    # REAL decode: composited RGB frames; key = the
                    # channel-0 pixel sum mod 2_147_483_647 (2^31 - 1,
                    # to stay int32), ts from cumulative GC delays.
                    try:
                        decoded = decode_gif(b)
                    except (ValueError, struct.error, IndexError):
                        decoded = None  # corrupt: fake sampler below
                if decoded is not None:
                    frames, delays, _wh = decoded
                    t_cs = 0
                    for i, (frame, d) in enumerate(zip(frames, delays)):
                        if i % every_n == 0:
                            ids.append(doc_id)
                            idxs.append(i)
                            tss.append(t_cs / 100.0)
                            keys.append(
                                int(
                                    frame[:, :, 0].sum(dtype=np.int64)
                                    % 2_147_483_647
                                )
                            )
                        t_cs += d
                    continue
                raw = np.frombuffer(b, dtype=np.uint8)
                nf = _fake_n_frames(len(raw))
                for i in range(0, nf, every_n):
                    off = i * len(raw) // nf
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i / FAKE_FPS)
                    keys.append(int(raw[off]) if len(raw) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_sec": pd.Series(tss, dtype="float64"),
                    "frame_key": pd.Series(keys, dtype="int32"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(gen, schema)
