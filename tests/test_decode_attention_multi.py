"""Multi-token (T>=1, GQA-capable) decode-attention kernel vs jnp oracle.

This is the speculative-verify kernel (models/spec_decode.py routes its
T=gamma target forward through it) and the GQA entry point for the plain
bf16 serving kernel. Interpret mode on CPU; reference counterpart of the
behavior it accelerates: fam/llm/fast_model.py:208-221 (GQA
repeat_interleave) + the T=gamma verify that the reference does not have.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import attention as A


def _setup(l=2, s=512, b=2, h=8, h_kv=8, t=4, dh=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, dh)).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(b, h_kv, t, dh)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(b, h_kv, t, dh)).astype(np.float32))
    k_cache = jnp.asarray(rng.normal(size=(l, s, b, h_kv, dh)).astype(np.float32))
    v_cache = jnp.asarray(rng.normal(size=(l, s, b, h_kv, dh)).astype(np.float32))
    return q, k_new, v_new, k_cache, v_cache


@pytest.mark.parametrize("pos", [0, 5, 253, 256, 400])
@pytest.mark.parametrize("t", [1, 4])
def test_multi_matches_reference(pos, t):
    q, k_new, v_new, k_cache, v_cache = _setup(t=t)
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)
    y_ref, kc_ref, vc_ref = A.decode_attention_multi_reference(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a
    )
    y, kc, vc = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(kc_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vc_ref), atol=1e-6)


@pytest.mark.parametrize("h,h_kv", [(8, 1), (8, 2), (8, 4)])
@pytest.mark.parametrize("pos", [7, 300])
def test_gqa_matches_reference(h, h_kv, pos):
    """VERDICT r4 #2: kernel-vs-jnp-oracle parity at H_kv in {1, H/4, ...}."""
    q, k_new, v_new, k_cache, v_cache = _setup(h=h, h_kv=h_kv, t=3)
    layer = jnp.asarray(0, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)
    y_ref, kc_ref, vc_ref = A.decode_attention_multi_reference(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a
    )
    y, kc, vc = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(kc_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vc_ref), atol=1e-6)


def test_gqa_single_token_entry():
    """decode_attention (T=1 API) routes GQA through the multi kernel."""
    q, k_new, v_new, k_cache, v_cache = _setup(h=8, h_kv=2, t=1)
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(100, jnp.int32)
    starts = jnp.asarray([3, 60], jnp.int32)
    y_ref, kc_ref, vc_ref = A.decode_attention_reference(
        q[:, :, 0], k_new[:, :, 0], v_new[:, :, 0], k_cache, v_cache,
        layer, pos_a, starts=starts,
    )
    y, kc, vc = A.decode_attention(
        q[:, :, 0], k_new[:, :, 0], v_new[:, :, 0], k_cache, v_cache,
        layer, pos_a, starts=starts, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(kc_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vc_ref), atol=1e-6)


def test_new_rows_written_and_visible():
    """Rows land at [pos, pos+T) and query t sees rows <= pos+t only."""
    q, k_new, v_new, k_cache, v_cache = _setup(t=4)
    layer = jnp.asarray(1, jnp.int32)
    pos = jnp.asarray(17, jnp.int32)
    _, kc, vc = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(kc[1, 17:21]), np.asarray(k_new.transpose(2, 0, 1, 3)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(kc[0]), np.asarray(k_cache[0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vc[1, 17:21]), np.asarray(v_new.transpose(2, 0, 1, 3)), atol=1e-6
    )


def test_ignores_beyond_window():
    """Garbage above pos+T-1 must not affect any query row."""
    q, k_new, v_new, k_cache, v_cache = _setup(t=4)
    layer = jnp.asarray(0, jnp.int32)
    pos = jnp.asarray(100, jnp.int32)
    y1, _, _ = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos, interpret=True
    )
    poisoned_k = k_cache.at[:, 104:].set(1e6)
    poisoned_v = v_cache.at[:, 104:].set(-1e6)
    y2, _, _ = A.decode_attention_multi(
        q, k_new, v_new, poisoned_k, poisoned_v, layer, pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.mark.parametrize(
    "pos,starts",
    [
        (400, (256, 300)),  # skip lands on a chunk boundary
        (400, (270, 390)),  # mid-chunk
        (400, (400, 400)),  # window is only the new rows (starts <= pos
        # always holds in practice; start > pos would make query t=0's
        # window empty, where kernel (zeros) and softmax oracle (uniform
        # average) legitimately diverge)
        (300, (0, 290)),  # no skip possible
    ],
)
def test_prefix_skip_matches_reference(pos, starts):
    q, k_new, v_new, k_cache, v_cache = _setup(t=4)
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)
    st = jnp.asarray(starts, jnp.int32)
    y_ref, _, _ = A.decode_attention_multi_reference(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, starts=st
    )
    y, _, _ = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos_a, starts=st, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3, rtol=1e-2)


def test_t1_matches_single_token_kernel():
    """T=1 multi == the classic single-token kernel (same semantics)."""
    q, k_new, v_new, k_cache, v_cache = _setup(t=1)
    layer = jnp.asarray(1, jnp.int32)
    pos = jnp.asarray(77, jnp.int32)
    y1, kc1, vc1 = A.decode_attention_multi(
        q, k_new, v_new, k_cache, v_cache, layer, pos, interpret=True
    )
    y2, kc2, vc2 = A.decode_attention(
        q[:, :, 0], k_new[:, :, 0], v_new[:, :, 0], k_cache, v_cache,
        layer, pos, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y1[:, :, 0]), np.asarray(y2), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kc1), np.asarray(kc2), atol=1e-6)
