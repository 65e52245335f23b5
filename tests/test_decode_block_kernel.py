"""Fused int8 decode-block megakernel vs composed ops (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz


def _setup(seed=0, b=2, h=4, dh=128, s=512, l=2):
    rng = np.random.default_rng(seed)
    d = h * dh
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05)
    qkv_q, qkv_s = qz.quantize_int8(wqkv)
    wo_q, wo_s = qz.quantize_int8(wo)
    k_cache = jnp.asarray(rng.normal(size=(l, s, b, h, dh)).astype(np.float32), jnp.bfloat16)
    v_cache = jnp.asarray(rng.normal(size=(l, s, b, h, dh)).astype(np.float32), jnp.bfloat16)
    return xa, (qkv_q, qkv_s), (wo_q, wo_s), k_cache, v_cache, (b, h, dh, d)


def _composed_reference(xa, qkv, wo, k_cache, v_cache, layer, pos, b, h, dh, d):
    """Same math via the already-validated pieces."""
    qkv_full = qz.matmul_int8_reference(xa, qkv[0], qkv[1])  # (B, 3D)
    q = qkv_full[:, :d].reshape(b, h, dh)
    k_new = qkv_full[:, d : 2 * d].reshape(b, h, dh)
    v_new = qkv_full[:, 2 * d :].reshape(b, h, dh)
    y, kc, vc = A.decode_attention_reference(
        q.astype(jnp.float32), k_new, v_new,
        k_cache.astype(jnp.float32), v_cache.astype(jnp.float32),
        layer, pos,
    )
    out = qz.matmul_int8_reference(y.reshape(b, d), wo[0], wo[1])
    return out, k_new, v_new


@pytest.mark.parametrize("pos", [0, 100, 300])
def test_megakernel_matches_composed(pos):
    xa, qkv, wo, k_cache, v_cache, (b, h, dh, d) = _setup()
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)

    y, kc, vc = A.decode_attention_block_int8(
        xa, qkv[0], qkv[1], wo[0], wo[1], k_cache, v_cache, layer, pos_a,
        n_head=h, interpret=True,
    )
    ref, k_new, v_new = _composed_reference(
        xa, qkv, wo, k_cache, v_cache, layer, pos_a, b, h, dh, d
    )
    ref_np = np.asarray(ref)
    scale = np.abs(ref_np).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(y).astype(np.float32), ref_np, atol=0.05 * scale, rtol=0.05
    )
    # new K/V row landed in the cache at (layer, pos); the kernel's bf16
    # MXU matmul differs from the f32 reference by ~1e-3
    k_ref = np.asarray(k_new).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(kc[1, pos]).astype(np.float32),
        k_ref,
        atol=0.02 * (np.abs(k_ref).max() + 1e-6),
    )
    # other layer untouched
    np.testing.assert_allclose(
        np.asarray(kc[0]).astype(np.float32),
        np.asarray(k_cache[0]).astype(np.float32),
        atol=1e-6,
    )


def test_megakernel_respects_starts():
    xa, qkv, wo, k_cache, v_cache, (b, h, dh, d) = _setup(seed=1)
    layer = jnp.asarray(0, jnp.int32)
    pos = jnp.asarray(200, jnp.int32)
    starts = jnp.asarray([0, 150], jnp.int32)
    y1, _, _ = A.decode_attention_block_int8(
        xa, qkv[0], qkv[1], wo[0], wo[1], k_cache, v_cache, layer, pos,
        n_head=h, starts=starts, interpret=True,
    )
    poisoned_k = k_cache.at[:, :140, 1].set(1e3)  # inside row 1's masked zone
    poisoned_v = v_cache.at[:, :140, 1].set(-1e3)
    y2, _, _ = A.decode_attention_block_int8(
        xa, qkv[0], qkv[1], wo[0], wo[1], poisoned_k, poisoned_v, layer, pos,
        n_head=h, starts=starts, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y1[1]).astype(np.float32), np.asarray(y2[1]).astype(np.float32), atol=1e-2
    )
