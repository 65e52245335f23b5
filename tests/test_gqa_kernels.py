"""GQA (n_kv_head < n_head) through the int4 serving kernels, interpret mode.

VERDICT r4 #2: the reference model is GQA-capable
(fam/llm/fast_model.py:208-221, repeat_interleave over n_local_heads), and
byte reduction is the only remaining lever at the HBM roof — the cache (and
its stream) shrinks by n_head/n_kv_head. These tests pin the GQA paths of
decode_attention_block_int4 (bf16 / int8 / int8-packed caches) and the
whole-stack megakernel against composed oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.ops.decode_stack import decode_stack_int4

L, H, DH, B, S = 2, 8, 128, 4, 512
D = H * DH  # 1024
IP = 2048
EPS = 1e-5


def _q4(arr):
    return jax.vmap(qz.quantize_int4_i32)(arr)


def _setup(h_kv, seed=0):
    rng = np.random.default_rng(seed)
    qout = D + 2 * h_kv * DH

    def w(*shape, s=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    xa = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32) * 0.3, jnp.bfloat16)
    wqkv = _q4(w(L, D, qout))
    wo = _q4(w(L, D, D))
    kc = jnp.asarray(rng.normal(size=(L, S, B, h_kv, DH)).astype(np.float32), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, S, B, h_kv, DH)).astype(np.float32), jnp.bfloat16)
    return xa, wqkv, wo, kc, vc


def _composed_reference(xa, wqkv, wo, kc, vc, layer, pos, h_kv, starts=None):
    """Same math via already-validated pieces (f32 attention oracle)."""
    qkv = qz.matmul_int4_i32_reference(
        xa.astype(jnp.float32), wqkv[0][layer], wqkv[1][layer]
    )
    dkv = h_kv * DH
    q = qkv[:, :D].reshape(B, H, DH)
    k_new = qkv[:, D : D + dkv].reshape(B, h_kv, DH)
    v_new = qkv[:, D + dkv :].reshape(B, h_kv, DH)
    y, kc2, vc2 = A.decode_attention_reference(
        q.astype(jnp.float32), k_new, v_new,
        kc.astype(jnp.float32), vc.astype(jnp.float32),
        jnp.asarray(layer), pos, starts=starts,
    )
    out = qz.matmul_int4_i32_reference(
        y.reshape(B, D).astype(jnp.float32), wo[0][layer], wo[1][layer]
    )
    return out, kc2, vc2


@pytest.mark.parametrize("h_kv", [1, 2, 4])
@pytest.mark.parametrize("pos", [0, 300])
def test_block_int4_gqa_bf16_cache(h_kv, pos):
    xa, wqkv, wo, kc, vc = _setup(h_kv)
    layer = 1
    pos_a = jnp.asarray(pos, jnp.int32)
    y, ko, vo, _, _ = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], kc, vc,
        jnp.asarray(layer, jnp.int32), pos_a, H, n_kv_head=h_kv, interpret=True,
    )
    ref, kr, vr = _composed_reference(xa, wqkv, wo, kc, vc, layer, pos_a, h_kv)
    ref_np = np.asarray(ref)
    scale = np.abs(ref_np).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(y).astype(np.float32), ref_np, atol=0.05 * scale, rtol=0.05
    )
    k_ref = np.asarray(kr[layer, pos]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ko[layer, pos]).astype(np.float32),
        k_ref,
        atol=0.02 * (np.abs(k_ref).max() + 1e-6),
    )
    # untouched layer intact
    np.testing.assert_allclose(
        np.asarray(ko[1 - layer]).astype(np.float32),
        np.asarray(kc[1 - layer]).astype(np.float32), atol=1e-6,
    )


def test_block_int4_gqa_respects_starts():
    xa, wqkv, wo, kc, vc = _setup(h_kv=2, seed=1)
    layer = jnp.asarray(0, jnp.int32)
    pos = jnp.asarray(200, jnp.int32)
    starts = jnp.asarray([0, 150, 0, 150], jnp.int32)
    y1, *_ = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], kc, vc, layer, pos, H,
        n_kv_head=2, starts=starts, interpret=True,
    )
    pk = kc.at[:, :140, 1].set(1e3)
    pv = vc.at[:, :140, 1].set(-1e3)
    y2, *_ = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], pk, pv, layer, pos, H,
        n_kv_head=2, starts=starts, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y1[1]).astype(np.float32),
        np.asarray(y2[1]).astype(np.float32), atol=1e-2,
    )


def _int8_cache_from_bf16(kc, vc, h_kv):
    """Quantize the bf16 history into the plain-int8 cache format."""
    bh = B * h_kv
    width = tfm.kv_scale_width(bh)
    kq, ks = tfm.quantize_kv_rows(kc)  # (L, S, B, Hkv, Dh), (L, S, B, Hkv, 1)
    vq, vs = tfm.quantize_kv_rows(vc)
    kst = jnp.zeros((L, S, 1, width), jnp.float32).at[:, :, 0, :bh].set(
        ks.reshape(L, S, bh)
    )
    vst = jnp.zeros((L, S, 1, width), jnp.float32).at[:, :, 0, :bh].set(
        vs.reshape(L, S, bh)
    )
    return kq, vq, kst, vst


def _packed_from_int8(kq, kst):
    """Plain-int8 cache -> int8-in-int32 packed + residue-split tables."""
    kp = jax.vmap(tfm.pack_kv_s)(kq)  # (L, S/4, B, Hkv, Dh) i32
    # (L, S, 1, W) -> (L, 4, S/4, 1, W): row j = positions 4w + j
    t = kst.reshape(L, S // 4, 4, 1, kst.shape[-1]).transpose(0, 2, 1, 3, 4)
    return kp, t


@pytest.mark.parametrize("h_kv", [2])
def test_block_int4_gqa_int8_cache(h_kv):
    """GQA + quantized KV cache: close to the bf16-cache GQA result (the
    only delta is int8 cache quantization, ~1%), and the new row's scale
    lands in the right table slot."""
    xa, wqkv, wo, kc, vc = _setup(h_kv)
    layer = jnp.asarray(0, jnp.int32)
    pos = jnp.asarray(211, jnp.int32)
    y_bf16, *_ = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], kc, vc, layer, pos, H,
        n_kv_head=h_kv, interpret=True,
    )
    kq, vq, kst, vst = _int8_cache_from_bf16(kc, vc, h_kv)
    y_i8, ko, vo, kso, vso = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], kq, vq, layer, pos, H,
        n_kv_head=h_kv, k_scale=kst, v_scale=vst, interpret=True,
    )
    ref = np.asarray(y_bf16).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(y_i8).astype(np.float32), ref, atol=0.06 * scale, rtol=0.06
    )
    # the new row's scales were written at (layer, pos)
    assert np.asarray(kso)[0, 211, 0, : B * h_kv].min() > 0

    # packed cache: same int8 values -> near-identical output
    kp, kspt = _packed_from_int8(kq, kst)
    vp, vspt = _packed_from_int8(vq, vst)
    y_pk, kop, vop, ksop, vsop = A.decode_attention_block_int4(
        xa, wqkv[0], wqkv[1], wo[0], wo[1], kp, vp, layer, pos, H,
        n_kv_head=h_kv, k_scale=kspt, v_scale=vspt, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pk).astype(np.float32),
        np.asarray(y_i8).astype(np.float32),
        atol=0.02 * scale, rtol=0.02,
    )
    # packed word row updated: unpack and compare to the plain-int8 row
    row = np.asarray(tfm.unpack_kv_s(kop[0, 211 // 4 : 211 // 4 + 1]))[211 % 4]
    np.testing.assert_array_equal(row, np.asarray(ko[0, 211]).astype(np.int32))


def _stack_setup(h_kv, seed=0):
    rng = np.random.default_rng(seed)
    qout = D + 2 * h_kv * DH

    def w(*shape, s=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    wqkv = _q4(w(L, D, qout))
    wo = _q4(w(L, D, D))
    w1 = _q4(w(L, D, IP))
    w3 = _q4(w(L, D, IP))
    w2 = _q4(w(L, IP, D))
    n1 = jnp.asarray(1.0 + rng.normal(size=(L, D)).astype(np.float32) * 0.1, jnp.bfloat16)
    n2 = jnp.asarray(1.0 + rng.normal(size=(L, D)).astype(np.float32) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32) * 0.3, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(L, S, B, h_kv, DH)).astype(np.float32), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, S, B, h_kv, DH)).astype(np.float32), jnp.bfloat16)
    return x, n1, n2, wqkv, wo, w1, w3, w2, kc, vc


def _norm_bf16(x, w):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + EPS)
    return xf.astype(jnp.bfloat16) * w.astype(jnp.bfloat16)


@pytest.mark.parametrize("h_kv", [2])
@pytest.mark.parametrize("pos", [5, 300])
def test_stack_gqa_matches_two_kernel(h_kv, pos):
    """Megakernel GQA is BIT-IDENTICAL to per-layer block-int4 GQA + FFN
    (same matmul helper, same rounding points) at equal cache chunk length
    — differing chunks only reorder the f32 flash accumulation."""
    x, n1, n2, wqkv, wo, w1, w3, w2, kc, vc = _stack_setup(h_kv)
    pos_a = jnp.asarray(pos, jnp.int32)

    xs, ks, vs = decode_stack_int4(
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1], kc, vc, pos_a, H, n_kv_head=h_kv,
        norm_eps=EPS, interpret=True, chunk=128,
    )

    xr, kr, vr = x, kc, vc
    for li in range(L):
        lin = jnp.asarray(li, jnp.int32)
        xa = _norm_bf16(xr, n1[li])
        y2, kr, vr, _, _ = A.decode_attention_block_int4(
            xa, wqkv[0], wqkv[1], wo[0], wo[1], kr, vr, lin, pos_a, H,
            n_kv_head=h_kv, interpret=True, chunk=128,
        )
        h = xr + y2.astype(xr.dtype)
        hn = _norm_bf16(h, n2[li])
        f = qz.decode_ffn_int4(
            hn, w1[0], w1[1], w3[0], w3[1], w2[0], w2[1], lin,
            interpret=True, tile=1024,
        )
        xr = h + f.astype(xr.dtype)

    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kr))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vr))
