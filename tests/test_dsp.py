"""Audio DSP (functions/dsp.py): framing, spectra, mel/MFCC, and the
Spark UDF integration — all checked against direct numpy math.
"""

import numpy as np
import pyspark.sql.functions as F

from computer_vision_foundations_spark.functions.dsp import (
    audio_spectral_features,
    dct2,
    frame_signal,
    hann_window,
    log_mel_energies,
    mel_filterbank,
    mfcc,
    power_spectrum,
)
from computer_vision_foundations_spark.functions.wav import encode_wav


def test_frame_signal_shapes_and_hop():
    x = np.arange(100)
    f = frame_signal(x, 16)
    assert f.shape == (6, 16) and (f[0] == np.arange(16)).all()
    assert (f[5] == np.arange(80, 96)).all()  # tail 96..99 dropped
    overlapped = frame_signal(x, 16, hop=8)
    assert overlapped.shape == (11, 16)
    assert (overlapped[1] == np.arange(8, 24)).all()
    assert frame_signal(np.arange(5), 16).shape == (0, 16)


def test_power_spectrum_parseval():
    """Σ|x|² · n == P[0] + 2·ΣP[mid] + P[nyq] for real signals
    (Parseval with rfft's one-sided layout)."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 64)
    p = power_spectrum(x)
    lhs = (x**2).sum(axis=1) * 64
    rhs = p[:, 0] + 2 * p[:, 1:-1].sum(axis=1) + p[:, -1]
    assert np.allclose(lhs, rhs)


def test_hann_window_endpoints():
    w = hann_window(8)
    assert w[0] == 0.0 and abs(w[4] - 1.0) < 1e-12
    assert np.allclose(w, 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8))


def test_mel_filterbank_properties():
    fb = mel_filterbank(10, 256, 16_000)
    assert fb.shape == (10, 129)
    assert (fb >= 0).all()
    # each filter is unimodal with a single peak strictly inside
    for m in range(10):
        peak = fb[m].argmax()
        assert fb[m, peak] > 0
    # filters cover ascending frequency ranges
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()


def test_dct2_orthonormal():
    rng = np.random.RandomState(1)
    x = rng.randn(5, 23)
    full = dct2(x)
    # orthonormal: applying the basis twice preserves the L2 norm
    assert np.allclose((full**2).sum(), (x**2).sum())
    head = dct2(x, n_out=13)
    assert head.shape == (5, 13)
    assert np.allclose(head, full[:, :13])


def test_mfcc_matches_manual_pipeline():
    rng = np.random.RandomState(2)
    pcm = (rng.randn(2000) * 1000).astype(np.int64)
    got = mfcc(pcm, 16_000, frame=256, hop=128, n_mels=23, n_coef=13)
    frames = frame_signal(pcm.astype(np.float64), 256, 128)
    p = power_spectrum(frames, hann_window(256))
    fb = mel_filterbank(23, 256, 16_000)
    want = dct2(log_mel_energies(p, fb), 13)
    assert got.shape == (frames.shape[0], 13)
    assert np.allclose(got, want)


def test_audio_spectral_features_udf(spark):
    """UDF sums over real WAV decode equal direct numpy on the PCM."""
    rng = np.random.RandomState(3)
    pcm = (rng.randn(640) * 5000).astype(np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(pcm, 8000)))],
        "doc_id long, content binary",
    )
    row = df.select(
        audio_spectral_features(8)(F.col("content")).alias("sp")
    ).collect()[0]
    frames = frame_signal(pcm.astype(np.float64), 8)
    p = power_spectrum(frames)
    bins = np.arange(5, dtype=np.float64)
    assert row.sp.n_frames == 80
    assert abs(row.sp.total_power - p.sum()) < 1e-6 * p.sum()
    assert (
        abs(row.sp.weighted_power - (p * bins[None, :]).sum())
        < 1e-6 * p.sum()
    )
    assert abs(row.sp.low_power - p[:, :2].sum()) < 1e-6 * p.sum()
