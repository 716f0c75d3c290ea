"""Audio feature extraction — framing, spectra, mel filterbank, MFCC.

Real DSP over decoded PCM (``functions/wav.py`` / ``functions/
media.py``): short-time power spectra via ``numpy.fft.rfft``, Hann
windowing, a Slaney-style mel filterbank, log-mel energies and a
DCT-II cepstrum — the standard public pipeline (Davis & Mermelstein
1980 for MFCC; Stevens–Volkmann mel scale) implemented directly on
numpy, no audio libraries.

The engine exposes one Arrow-batched UDF (``audio_spectral_features``)
whose outputs are plain sums over |DFT|² bins, chosen so a SQL engine
can replay them as explicit cos/sin quadrature sums (the z23 oracle:
rectangular window, frame=8 → 5 rfft bins). The richer mel/MFCC path
is pytest-verified against direct numpy.

Scale shape: everything here is per-row batch math inside narrow
Arrow projections — no shuffle; spectra are computed where the bytes
sit and only fixed-width feature rows leave the UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

__all__ = [
    "frame_signal",
    "hann_window",
    "power_spectrum",
    "mel_filterbank",
    "log_mel_energies",
    "dct2",
    "mfcc",
    "audio_spectral_features",
]


def frame_signal(
    x: np.ndarray, frame: int, hop: int | None = None
) -> np.ndarray:
    """Slice a 1-D signal into ``(n_frames, frame)`` windows (hop
    defaults to ``frame`` — non-overlapping); the tail that doesn't
    fill a frame is dropped."""
    hop = frame if hop is None else hop
    x = np.asarray(x)
    if len(x) < frame:
        return np.zeros((0, frame), dtype=x.dtype)
    n = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (the STFT convention)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def power_spectrum(
    frames: np.ndarray, window: np.ndarray | None = None
) -> np.ndarray:
    """``(n_frames, frame)`` → ``(n_frames, frame // 2 + 1)`` power
    |rfft|² per frame, optionally windowed."""
    f = np.asarray(frames, dtype=np.float64)
    if window is not None:
        f = f * window[None, :]
    spec = np.fft.rfft(f, axis=1)
    return (spec.real**2) + (spec.imag**2)


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank ``(n_mels, n_fft // 2 + 1)`` with
    filters equally spaced on the mel scale between ``fmin`` and
    ``fmax`` (default Nyquist)."""
    fmax = sample_rate / 2.0 if fmax is None else fmax
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(
        _hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2
    )
    hz_pts = _mel_to_hz(mel_pts)
    bin_hz = np.arange(n_bins) * sample_rate / n_fft
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_hz - lo) / max(ctr - lo, 1e-12)
        down = (hi - bin_hz) / max(hi - ctr, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def log_mel_energies(
    power: np.ndarray, fb: np.ndarray, eps: float = 1e-10
) -> np.ndarray:
    """``(n_frames, n_bins) × (n_mels, n_bins)`` → log mel energies."""
    return np.log(power @ fb.T + eps)


def dct2(x: np.ndarray, n_out: int | None = None) -> np.ndarray:
    """Orthonormal DCT-II along the last axis (the MFCC cepstral
    transform), computed by direct matmul against the cosine basis."""
    n = x.shape[-1]
    k = np.arange(n_out if n_out is not None else n)[:, None]
    basis = np.cos(np.pi * k * (2 * np.arange(n)[None, :] + 1) / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    return x @ basis.T


def mfcc(
    pcm: np.ndarray,
    sample_rate: int,
    frame: int = 256,
    hop: int = 128,
    n_mels: int = 23,
    n_coef: int = 13,
) -> np.ndarray:
    """PCM → ``(n_frames, n_coef)`` MFCCs: Hann STFT power → mel
    filterbank → log → DCT-II."""
    frames = frame_signal(np.asarray(pcm, dtype=np.float64), frame, hop)
    power = power_spectrum(frames, hann_window(frame))
    fb = mel_filterbank(n_mels, frame, sample_rate)
    return dct2(log_mel_energies(power, fb), n_coef)


def audio_spectral_features(frame: int = 8):
    """Arrow-batched UDF: binary → DFT-power sums over the decoded
    signal (real WAV codec for RIFF bytes, byte-PCM fake otherwise),
    rectangular window, non-overlapping frames:

    ``struct<n_frames:bigint, total_power:double,
    weighted_power:double, low_power:double>`` where per rfft bin
    ``f``: total = ΣΣ P[f], weighted = ΣΣ f·P[f], low = ΣΣ P[f≤1].
    Spectral centroid and band ratios then derive RELATIONALLY
    (one division each), which keeps the SQL oracle to plain
    quadrature sums (Σs·cos)² + (Σs·sin)² — no FFT needed on the
    oracle side."""
    from computer_vision_foundations_spark.functions.media import (
        _decode_any_audio,
    )

    @F.pandas_udf(
        "struct<n_frames:bigint,total_power:double,"
        "weighted_power:double,low_power:double>"
    )
    def f(contents: pd.Series) -> pd.DataFrame:
        n_frames, total, weighted, low = [], [], [], []
        bins = np.arange(frame // 2 + 1, dtype=np.float64)
        for b in contents:
            pcm, _rate = _decode_any_audio(bytes(b) if b else b"")
            frames = frame_signal(pcm.astype(np.float64), frame)
            p = power_spectrum(frames)
            n_frames.append(len(frames))
            total.append(float(p.sum()))
            weighted.append(float((p * bins[None, :]).sum()))
            low.append(float(p[:, :2].sum()))
        return pd.DataFrame(
            {
                "n_frames": pd.Series(n_frames, dtype="int64"),
                "total_power": total,
                "weighted_power": weighted,
                "low_power": low,
            }
        )

    return f
