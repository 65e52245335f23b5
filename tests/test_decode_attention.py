"""Fused decode-attention kernel vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import attention as A


def _setup(l=2, s=512, b=2, h=4, dh=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32))
    k_cache = jnp.asarray(rng.normal(size=(l, s, b, h, dh)).astype(np.float32))
    v_cache = jnp.asarray(rng.normal(size=(l, s, b, h, dh)).astype(np.float32))
    return q, k_new, v_new, k_cache, v_cache


@pytest.mark.parametrize("pos", [0, 5, 255, 256, 400])
def test_kernel_matches_reference(pos):
    q, k_new, v_new, k_cache, v_cache = _setup()
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)
    y_ref, kc_ref, vc_ref = A.decode_attention_reference(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a
    )
    y, kc, vc = A.decode_attention(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(kc_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vc_ref), atol=1e-6)


def test_kernel_ignores_beyond_pos():
    """Garbage in cache slots > pos must not affect the output."""
    q, k_new, v_new, k_cache, v_cache = _setup()
    layer = jnp.asarray(0, jnp.int32)
    pos = jnp.asarray(100, jnp.int32)
    y1, _, _ = A.decode_attention(
        q, k_new, v_new, k_cache, v_cache, layer, pos, interpret=True
    )
    poisoned_k = k_cache.at[:, 200:].set(1e6)
    poisoned_v = v_cache.at[:, 200:].set(-1e6)
    y2, _, _ = A.decode_attention(
        q, k_new, v_new, poisoned_k, poisoned_v, layer, pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_new_kv_written_at_pos():
    q, k_new, v_new, k_cache, v_cache = _setup()
    layer = jnp.asarray(1, jnp.int32)
    pos = jnp.asarray(7, jnp.int32)
    _, kc, vc = A.decode_attention(
        q, k_new, v_new, k_cache, v_cache, layer, pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(kc[1, 7]), np.asarray(k_new), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc[1, 7]), np.asarray(v_new), atol=1e-6)
    # other layers untouched
    np.testing.assert_allclose(np.asarray(kc[0]), np.asarray(k_cache[0]), atol=1e-6)


@pytest.mark.parametrize(
    "pos,starts",
    [
        (400, (256, 300)),  # skip lands exactly on a chunk boundary
        (400, (270, 390)),  # skip lands mid-chunk
        (400, (400, 400)),  # whole window empty except the new row
        (300, (0, 290)),    # one row still spans the full prefix -> no skip
    ],
)
def test_prefix_skip_matches_reference(pos, starts):
    """Chunks below min(starts) are skipped entirely (VERDICT r4: the dead
    cache prefix dominated long-position engine decode). Must stay bit-exact
    vs the oracle for any starts placement relative to chunk boundaries."""
    q, k_new, v_new, k_cache, v_cache = _setup()
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)
    st = jnp.asarray(starts, jnp.int32)
    y_ref, _, _ = A.decode_attention_reference(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, starts=st
    )
    y, _, _ = A.decode_attention(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, starts=st, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)
