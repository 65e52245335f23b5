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


def test_band_split_sums_to_identity():
    """julius band-split invariant: the n bands sum back to the signal."""
    wav = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4800)).astype(np.float32))
    for n in (4, 8, 32):
        bands = mbd.split_bands(wav, 24000, n)
        assert len(bands) == n
        np.testing.assert_allclose(
            np.asarray(sum(bands)), np.asarray(wav), atol=1e-4
        )


def test_band_split_separates_frequencies():
    """A low tone should live in the early bands, a high tone in late ones."""
    sr = 24000
    t = np.arange(4800) / sr
    low = jnp.asarray(np.sin(2 * np.pi * 100 * t, dtype=np.float64).astype(np.float32))[None]
    high = jnp.asarray(np.sin(2 * np.pi * 10000 * t, dtype=np.float64).astype(np.float32))[None]
    low_bands = [float(jnp.abs(b).mean()) for b in mbd.split_bands(low, sr, 4)]
    high_bands = [float(jnp.abs(b).mean()) for b in mbd.split_bands(high, sr, 4)]
    assert np.argmax(low_bands) == 0
    assert np.argmax(high_bands) == 3


TINY_MBD = mbd.MBDConfig(
    n_processes=2,
    unet=mbd.UNetConfig(hidden=4, depth=2, num_steps=16, codec_dim=16),
    step_list=(15, 7, 0),
    processor_bands=4,
    eq_bands=8,
)


def test_mbd_generate_shapes():
    params = mbd.init_params(jax.random.PRNGKey(0), TINY_MBD)
    emb = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, 16)).astype(np.float32))
    wav = np.asarray(mbd.generate(params, TINY_MBD, emb, 1280, jax.random.PRNGKey(1)))
    assert wav.shape == (1, 1280)
    assert np.isfinite(wav).all()


def test_mbd_tokens_to_wav():
    from metavoice_tpu.models import encodec as ec

    ecfg = ec.EncodecConfig(n_filters=4, dimension=16, codebook_size=32, n_q=2, ratios=(4, 2))
    eparams = ec.init_params(jax.random.PRNGKey(0), ecfg)
    params = mbd.init_params(jax.random.PRNGKey(1), TINY_MBD)
    codes = np.random.default_rng(5).integers(0, 32, size=(2, 8))
    wav = np.asarray(
        mbd.tokens_to_wav(
            params, TINY_MBD, eparams, jnp.asarray(codes), jax.random.PRNGKey(2),
            encodec_cfg=ecfg,
        )
    )
    assert wav.shape == (1, 8 * ecfg.hop_length)
    assert np.isfinite(wav).all()


def test_re_eq_matches_band_energy():
    """After re_eq, each band of wav has (about) the ref band's std."""
    rng = np.random.default_rng(6)
    sr = 24000
    wav = jnp.asarray(rng.normal(size=(1, 4800)).astype(np.float32) * 5.0)
    ref = jnp.asarray(rng.normal(size=(1, 4800)).astype(np.float32))
    out = mbd.re_eq(wav, ref, sr, n_bands=4)
    out_bands = mbd.split_bands(out, sr, 4)
    ref_bands = mbd.split_bands(ref, sr, 4)
    for ob, rb in zip(out_bands, ref_bands):
        ratio = float(ob.std() / rb.std())
        assert 0.5 < ratio < 2.0, ratio


def test_processor_project_return_roundtrip():
    proc = {
        "counts": jnp.asarray([10.0]),
        "sum_x": jnp.asarray([1.0, -2.0, 0.5, 0.0]),
        "sum_x2": jnp.asarray([30.0, 25.0, 12.0, 10.0]),
        "sum_target_x2": jnp.asarray([9.0, 11.0, 10.0, 10.5]),
    }
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 2400)).astype(np.float32))
    projected = mbd.processor_project_sample(proc, x, 24000, 4)
    restored = mbd.processor_return_sample(proc, projected, 24000, 4)
    # roundtrip is identity up to band-split leakage
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x), atol=0.05)
