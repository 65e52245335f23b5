"""EnCodec JAX implementation tests (architecture invariants; real-weight
parity is exercised separately once converted checkpoints are available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.models import encodec as ec

# Small config keeps CPU compile time down: same topology, fewer channels.
SMALL = ec.EncodecConfig(n_filters=4, dimension=16, codebook_size=64, n_q=4)


@pytest.fixture(scope="module")
def params():
    return ec.init_params(jax.random.PRNGKey(0), SMALL)


def test_hop_and_frame_rate():
    cfg = ec.EncodecConfig()
    assert cfg.hop_length == 320
    assert cfg.frame_rate == 75
    assert cfg.max_channels == 512


def test_decode_shape(params):
    codes = np.random.default_rng(0).integers(0, 64, size=(SMALL.n_q, 15))
    wav = np.asarray(ec.decode_codes(params, SMALL, codes))
    assert wav.shape == (1, 15 * SMALL.hop_length)
    assert np.isfinite(wav).all()


def test_encode_shape(params):
    wav = np.random.default_rng(1).normal(size=(1, 10 * SMALL.hop_length)).astype(np.float32) * 0.1
    codes = np.asarray(ec.encode_codes(params, SMALL, jnp.asarray(wav)))
    assert codes.shape == (1, SMALL.n_q, 10)
    assert (codes >= 0).all() and (codes < 64).all()


def test_rvq_roundtrip():
    """Latents that are exact codebook sums must encode back to their codes.

    Uses block-orthogonal codebooks (each stage occupies its own coordinate
    block) so the greedy stage-wise nearest-neighbour search is provably
    exact — random Gaussian codebooks don't guarantee recovery, trained RVQ
    codebooks (decreasing residual energy) do in practice.
    """
    rng = np.random.default_rng(2)
    n_q, k, d_block = SMALL.n_q, 64, SMALL.dimension // SMALL.n_q
    cb = np.zeros((n_q, k, SMALL.dimension), np.float32)
    for q in range(n_q):
        cb[q, :, q * d_block : (q + 1) * d_block] = rng.normal(size=(k, d_block))
    cb = jnp.asarray(cb)
    codes = jnp.asarray(rng.integers(0, k, size=(1, n_q, 9)))
    latent = ec.rvq_decode(cb, codes)
    recovered = ec.rvq_encode(cb, latent, n_q)
    np.testing.assert_array_equal(np.asarray(recovered), np.asarray(codes))


def test_decoder_causality(params):
    """Causal decoder: changing a late frame's code cannot affect early audio."""
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 64, size=(SMALL.n_q, 12))
    wav_a = np.asarray(ec.decode_codes(params, SMALL, codes))
    codes_b = codes.copy()
    codes_b[:, 8] = (codes_b[:, 8] + 1) % 64
    wav_b = np.asarray(ec.decode_codes(params, SMALL, codes_b))
    hop = SMALL.hop_length
    # frames < 8 unchanged (LSTM/convs are causal)
    np.testing.assert_allclose(wav_a[0, : 7 * hop], wav_b[0, : 7 * hop], atol=1e-5)
    assert not np.allclose(wav_a[0, 8 * hop :], wav_b[0, 8 * hop :], atol=1e-6)
