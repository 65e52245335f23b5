"""Audio DSP op tests against scipy/numpy oracles."""

import numpy as np
import pytest

from metavoice_tpu.ops import audio as A


def test_hann_window_periodic():
    w = A.hann_window(8)
    # periodic hann: w[0] == 0, symmetric around N/2
    assert w[0] == 0.0
    np.testing.assert_allclose(w[1:], w[1:][::-1][:7], atol=1e-6)


def test_stft_matches_numpy_dft():
    rng = np.random.default_rng(0)
    y = rng.normal(size=512).astype(np.float32)
    n_fft, hop = 128, 64
    out = np.asarray(A.stft(y, n_fft, hop))
    # manual: reflect pad, frame, window, rfft
    ypad = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    w = A.hann_window(n_fft)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    ref = np.stack(
        [np.fft.rfft(ypad[i * hop : i * hop + n_fft] * w) for i in range(n_frames)]
    )
    assert out.shape == ref.shape == (1 + len(y) // hop, n_fft // 2 + 1)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_mel_filterbank_properties():
    fb = A.mel_filterbank(16000, 400, 40)
    assert fb.shape == (40, 201)
    assert (fb >= 0).all()
    # every filter has nonzero support; supports are ordered by frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_mel_spectrogram_tone_peak():
    """A pure 1 kHz tone must peak in the mel bin whose center is nearest 1 kHz."""
    sr = 16000
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    m = np.asarray(A.mel_spectrogram(y))
    assert m.shape[0] == 40
    mean_energy = m.mean(axis=1)
    fb = A.mel_filterbank(sr, 400, 40)
    freqs = np.linspace(0, sr / 2, 201)
    centers = freqs[fb.argmax(axis=1)]
    expected_bin = np.abs(centers - 1000).argmin()
    assert abs(int(mean_energy.argmax()) - int(expected_bin)) <= 1


def test_resample_preserves_dc():
    y = np.ones(1000, np.float32)
    out = np.asarray(A.resample(y, 24000, 16000))
    assert out.shape[-1] == int(np.ceil(1000 * 2 / 3))
    # trim the FIR half-width edge transient (~40 samples at this ratio)
    np.testing.assert_allclose(out[45:-45], 1.0, atol=1e-3)


def test_resample_preserves_tone_freq():
    """440 Hz at 24 kHz resampled to 16 kHz is still 440 Hz."""
    sr_in, sr_out, f0 = 24000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = np.asarray(A.resample(y, sr_in, sr_out))
    spec = np.abs(np.fft.rfft(out[100:-100] * np.hanning(len(out) - 200)))
    peak_hz = np.fft.rfftfreq(len(out) - 200, 1 / sr_out)[spec.argmax()]
    assert abs(peak_hz - f0) < 5.0


def test_resample_identity():
    y = np.random.default_rng(1).normal(size=256).astype(np.float32)
    out = np.asarray(A.resample(y, 16000, 16000))
    np.testing.assert_array_equal(out, y)


def test_resample_upsample_length():
    y = np.zeros(300, np.float32)
    out = np.asarray(A.resample(y, 16000, 24000))
    assert out.shape[-1] == 450
