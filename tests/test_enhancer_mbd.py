"""Enhancer + MBD vocoder tests (structure/DSP invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.models import enhancer as enh
from metavoice_tpu.models import mbd
from metavoice_tpu.ops.audio import stft


def test_istft_roundtrip():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=4096).astype(np.float32)
    spec = stft(jnp.asarray(wav), 512, 128)
    rec = np.asarray(enh.istft(spec, 512, 128, length=len(wav)))
    # perfect reconstruction away from the edges
    np.testing.assert_allclose(rec[256:-256], wav[256:-256], atol=1e-3)


def test_spectral_gate_reduces_noise_keeps_speechlike_tone():
    """Speech-like bursts (tone with pauses) survive; broadband hiss drops.

    (A *steady* tone is indistinguishable from the noise floor for a
    percentile gate — pauses are what let the floor estimate see the noise,
    as they do in real speech.)
    """
    sr = 24000
    t = np.arange(2 * sr) / sr
    envelope = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float32)  # bursts
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) * envelope
    noise = 0.01 * np.random.default_rng(1).normal(size=len(t))
    noisy = (tone + noise).astype(np.float32)
    out = enh.SpectralGateEnhancer()(noisy, sr)
    assert out.shape == noisy.shape
    spec_in = np.abs(np.fft.rfft(noisy))
    spec_out = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(noisy), 1 / sr)
    tone_band = (freqs > 430) & (freqs < 450)
    hiss_band = freqs > 8000
    assert spec_out[tone_band].sum() > 0.7 * spec_in[tone_band].sum()
    assert spec_out[hiss_band].sum() < 0.8 * spec_in[hiss_band].sum()


def test_erb_filterbank_covers_spectrum():
    fb = enh.erb_filterbank(24000, 960, 32)
    assert fb.shape == (32, 481)
    assert (fb.sum(axis=1) > 0).all()
    # every bin is covered by at least one band
    assert (fb.sum(axis=0) > 0).sum() >= 450


def test_df_enhancer_runs():
    e = enh.get_enhancer("df")
    wav = np.random.default_rng(2).normal(size=24000).astype(np.float32) * 0.1
    out = e(wav, 24000)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()


def test_get_enhancer_factory():
    assert isinstance(enh.get_enhancer("spectral_gate"), enh.SpectralGateEnhancer)
    ident = enh.get_enhancer("none")
    x = np.ones(10, np.float32)
    np.testing.assert_array_equal(ident(x, 24000), x)
    with pytest.raises(ValueError):
        enh.get_enhancer("bogus")


# ----------------------------------------------------------------- MBD


def test_band_split_merge_identity():
    cfg = mbd.MBDConfig()
    wav = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4800)).astype(np.float32))
    bands = mbd.split_bands(wav, cfg)
    assert bands.shape == (4, 1, 4800)
    merged = np.asarray(mbd.merge_bands(bands))
    np.testing.assert_allclose(merged, np.asarray(wav), atol=1e-5)


def test_mbd_sample_shapes():
    cfg = mbd.MBDConfig(hidden=8, depth=2, num_sample_steps=2, cond_dim=16)
    params = mbd.init_params(jax.random.PRNGKey(0), cfg)
    latent = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, 16)).astype(np.float32))
    wav = np.asarray(mbd.sample(params, cfg, latent, jax.random.PRNGKey(1)))
    assert wav.shape == (1, 4 * 320)
    assert np.isfinite(wav).all()


def test_mbd_tokens_to_wav():
    from metavoice_tpu.models import encodec as ec

    ecfg = ec.EncodecConfig(n_filters=4, dimension=16, codebook_size=32, n_q=2)
    eparams = ec.init_params(jax.random.PRNGKey(0), ecfg)
    cfg = mbd.MBDConfig(hidden=8, depth=2, num_sample_steps=2, cond_dim=16)
    params = mbd.init_params(jax.random.PRNGKey(1), cfg)
    codes = np.random.default_rng(5).integers(0, 32, size=(2, 4))
    wav = np.asarray(
        mbd.tokens_to_wav(params, cfg, eparams, jnp.asarray(codes), jax.random.PRNGKey(2))
    )
    assert wav.shape == (1, 4 * 320)
