"""Whole-stack fused decode kernel vs the two-kernel path (interpret mode).

The stack kernel (ops/decode_stack.py) must be numerically IDENTICAL to the
per-layer route (decode_attention_block_int4 + decode_ffn_int4 with norms and
residual adds in XLA): same matmul helper, same f32->bf16 rounding points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.ops.decode_stack import decode_stack_int4

L, H, DH, B, S = 3, 8, 128, 2, 512
D = H * DH  # 1024
IP = 2048
EPS = 1e-5


def _norm_bf16(x, w):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + EPS)
    return xf.astype(jnp.bfloat16) * w.astype(jnp.bfloat16)


def _setup(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    def q4(arr):  # (L, in, out) -> packed dict leaves
        pw, sc = jax.vmap(qz.quantize_int4_i32)(arr)
        return pw, sc

    wqkv = q4(w(L, D, 3 * D))
    wo = q4(w(L, D, D))
    w1 = q4(w(L, D, IP))
    w3 = q4(w(L, D, IP))
    w2 = q4(w(L, IP, D))
    n1 = jnp.asarray(1.0 + rng.normal(size=(L, D)).astype(np.float32) * 0.1, jnp.bfloat16)
    n2 = jnp.asarray(1.0 + rng.normal(size=(L, D)).astype(np.float32) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32) * 0.3, jnp.bfloat16)
    k_cache = jnp.asarray(rng.normal(size=(L, S, B, H, DH)).astype(np.float32), jnp.bfloat16)
    v_cache = jnp.asarray(rng.normal(size=(L, S, B, H, DH)).astype(np.float32), jnp.bfloat16)
    return x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache


def _two_kernel_reference(x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache, pos, starts=None):
    """body4 from transformer.apply_blocks, via the per-layer kernels."""
    kf, vf = k_cache, v_cache
    for li in range(L):
        lin = jnp.asarray(li, jnp.int32)
        xa = _norm_bf16(x, n1[li])
        y2, kf, vf, _, _ = A.decode_attention_block_int4(
            xa, wqkv[0], wqkv[1], wo[0], wo[1], kf, vf, lin,
            jnp.asarray(pos, jnp.int32), H, starts=starts, interpret=True,
            tile=1024,
        )
        h = x + y2.astype(x.dtype)
        hn = _norm_bf16(h, n2[li])
        f = qz.decode_ffn_int4(
            hn, w1[0], w1[1], w3[0], w3[1], w2[0], w2[1], lin,
            interpret=True, tile=1024,
        )
        x = h + f.astype(x.dtype)
    return x, kf, vf


@pytest.mark.parametrize("pos", [0, 100, 300])
def test_stack_matches_two_kernel(pos):
    x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache = _setup()
    xs, ks, vs = decode_stack_int4(
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1], k_cache, v_cache,
        jnp.asarray(pos, jnp.int32), H, norm_eps=EPS, bigdot=False,
        interpret=True,
    )
    xr, kr, vr = _two_kernel_reference(
        x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache, pos
    )
    np.testing.assert_allclose(
        np.asarray(xs, np.float32), np.asarray(xr, np.float32), atol=1e-2, rtol=1e-2
    )
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kr))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vr))


def test_stack_respects_starts():
    """Ragged windows: rows with starts > 0 ignore the early cache prefix."""
    x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache = _setup(seed=3)
    pos = 200
    starts = jnp.asarray([0, 150], jnp.int32)
    xs, _, _ = decode_stack_int4(
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1], k_cache, v_cache,
        jnp.asarray(pos, jnp.int32), H, starts=starts, norm_eps=EPS,
        bigdot=False, interpret=True,
    )
    xr, _, _ = _two_kernel_reference(
        x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache, pos, starts=starts
    )
    np.testing.assert_allclose(
        np.asarray(xs, np.float32), np.asarray(xr, np.float32), atol=1e-2, rtol=1e-2
    )


def test_stack_bigdot_close_to_exact():
    """The big-dot serving mode (bf16 per-weight dequant before the MXU —
    the reference's aten _weight_int4pack_mm semantics) stays within bf16
    accumulation distance of the exact-group-scaling mode."""
    x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache = _setup(seed=1)
    args = (
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1],
    )
    pos = jnp.asarray(120, jnp.int32)
    exact, _, _ = decode_stack_int4(
        *args, k_cache, v_cache, pos, H, norm_eps=EPS, bigdot=False,
        interpret=True,
    )
    fast, _, _ = decode_stack_int4(
        *args, k_cache, v_cache, pos, H, norm_eps=EPS, bigdot=True,
        interpret=True,
    )
    e = np.asarray(exact, np.float32)
    f = np.asarray(fast, np.float32)
    scale = np.abs(e).max() + 1e-6
    assert np.abs(e - f).max() / scale < 0.08, (e[:, :4], f[:, :4])


def test_stack_slabdot_close_to_exact():
    """The slab-dot experiment mode (in-register bf16 nibble scaling, one
    MXU dot per slab — measured 418 tok/s vs 536 exact on chip, kept as a
    documented dead end behind MVTPU_STACK_SLABDOT) stays within bf16
    accumulation distance of the exact-group-scaling mode."""
    x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache = _setup(seed=3)
    args = (
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1],
    )
    pos = jnp.asarray(120, jnp.int32)
    exact, _, _ = decode_stack_int4(
        *args, k_cache, v_cache, pos, H, norm_eps=EPS, bigdot=False,
        interpret=True,
    )
    fast, _, _ = decode_stack_int4(
        *args, k_cache, v_cache, pos, H, norm_eps=EPS, slabdot=True,
        interpret=True,
    )
    e = np.asarray(exact, np.float32)
    f = np.asarray(fast, np.float32)
    scale = np.abs(e).max() + 1e-6
    assert np.abs(e - f).max() / scale < 0.08, (e[:, :4], f[:, :4])


def test_stack_fused_head_matches_reference():
    """Fused final-norm + int4 tied-head phase == jnp reference on the same
    residual stream (exact-mode blocks, reference int4 matmul oracle)."""
    x, n1, n2, wqkv, wo, w1, w3, w2, k_cache, v_cache = _setup(seed=7)
    vocab, vp = 200, 1024
    rng = np.random.default_rng(11)
    wte = jnp.asarray(rng.normal(size=(vocab, D)).astype(np.float32) * 0.05)
    wt = jnp.concatenate([wte.T, jnp.zeros((D, vp - vocab), jnp.float32)], axis=1)
    hpw, hsc = qz.quantize_int4_i32(wt)
    hsc = jnp.where((jnp.arange(vp) < vocab)[None, :], hsc, 0.0)
    lnf = jnp.ones((D,), jnp.bfloat16)
    pos = jnp.asarray(64, jnp.int32)

    xs, _, _, lg = decode_stack_int4(
        x, n1, n2, wqkv[0], wqkv[1], wo[0], wo[1], w1[0], w1[1],
        w3[0], w3[1], w2[0], w2[1], k_cache, v_cache, pos, H,
        norm_eps=EPS, bigdot=False, ln_f_w=lnf, head_pw=hpw, head_sc=hsc,
        interpret=True,
    )
    # reference: same normed hidden through the jnp int4 oracle
    xn = _norm_bf16(xs, lnf)
    ref = qz.matmul_int4_i32_reference(xn.astype(jnp.float32), hpw, hsc)
    np.testing.assert_allclose(
        np.asarray(lg[:, :vocab], np.float32),
        np.asarray(ref[:, :vocab], np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # vocab padding columns carry zeroed scales -> exactly zero logits
    np.testing.assert_array_equal(np.asarray(lg[:, vocab:]), 0.0)


def test_pack_int8_i32_roundtrip():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-128, 128, (64, 32)), jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(qz.unpack_int8_i32(qz.pack_int8_i32(q))), np.asarray(q)
    )


def test_int8_i32_matmul_reference_close_to_dense():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    pw, sc = qz.quantize_int8_i32(w)
    out = qz.matmul_int8_i32_reference(x, pw, sc)
    ref = x @ w
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-6))
    assert err < 0.02, err


def test_stack_i8_matches_reference():
    """The packed-int8 ("i8" word format) stack kernel == the jnp oracle
    composed from matmul_int8_i32_reference + the flash-attention reference.
    This is the 2-byte-ceiling read path for the int8 quality mode."""
    rng = np.random.default_rng(5)

    def q8(*shape, s=0.05):
        w = rng.normal(size=shape).astype(np.float32) * s
        pw, sc = jax.vmap(qz.quantize_int8_i32)(jnp.asarray(w))
        return jnp.asarray(w), pw, sc

    L_, H_, DH_, B_, S_ = 2, 8, 128, 2, 512
    D_ = H_ * DH_
    IP_ = 2048
    wqkv_d, wqkv_p, wqkv_s = q8(L_, D_, 3 * D_)
    wo_d, wo_p, wo_s = q8(L_, D_, D_)
    w1_d, w1_p, w1_s = q8(L_, D_, IP_)
    w3_d, w3_p, w3_s = q8(L_, D_, IP_)
    w2_d, w2_p, w2_s = q8(L_, IP_, D_)
    n1 = jnp.asarray(1.0 + rng.normal(size=(L_, D_)).astype(np.float32) * 0.1, jnp.bfloat16)
    n2 = jnp.asarray(1.0 + rng.normal(size=(L_, D_)).astype(np.float32) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B_, D_)).astype(np.float32) * 0.3, jnp.bfloat16)
    k_cache = jnp.asarray(rng.normal(size=(L_, S_, B_, H_, DH_)).astype(np.float32), jnp.bfloat16)
    v_cache = jnp.asarray(rng.normal(size=(L_, S_, B_, H_, DH_)).astype(np.float32), jnp.bfloat16)
    pos = jnp.asarray(100, jnp.int32)

    xs, ks, vs = decode_stack_int4(
        x, n1, n2, wqkv_p, wqkv_s, wo_p, wo_s, w1_p, w1_s, w3_p, w3_s,
        w2_p, w2_s, k_cache, v_cache, pos, H_, norm_eps=EPS, wfmt="i8",
        interpret=True,
    )

    # jnp oracle, same packed weights, per-layer
    xo = x
    kf, vf = k_cache, v_cache
    for li in range(L_):
        xa = _norm_bf16(xo, n1[li])
        qkv = qz.matmul_int8_i32_reference(xa.astype(jnp.float32), wqkv_p[li], wqkv_s[li])
        q = qkv[:, :D_].reshape(B_, H_, DH_)
        k_new = qkv[:, D_ : 2 * D_].reshape(B_, H_, DH_)
        v_new = qkv[:, 2 * D_ :].reshape(B_, H_, DH_)
        y, kf, vf = A.decode_attention_reference(
            q, k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
            kf.astype(jnp.float32), vf.astype(jnp.float32),
            jnp.asarray(li), pos,
        )
        kf = kf.astype(jnp.bfloat16)
        vf = vf.astype(jnp.bfloat16)
        att = qz.matmul_int8_i32_reference(
            y.reshape(B_, D_).astype(jnp.float32), wo_p[li], wo_s[li]
        )
        h = xo + att.astype(xo.dtype)
        hn = _norm_bf16(h, n2[li])
        h1 = qz.matmul_int8_i32_reference(hn.astype(jnp.float32), w1_p[li], w1_s[li])
        h3 = qz.matmul_int8_i32_reference(hn.astype(jnp.float32), w3_p[li], w3_s[li])
        f = qz.matmul_int8_i32_reference(
            (jax.nn.silu(h1) * h3), w2_p[li], w2_s[li]
        )
        xo = h + f.astype(xo.dtype)

    a = np.asarray(xs, np.float32)
    r = np.asarray(xo, np.float32)
    scale = np.abs(r).max() + 1e-6
    assert np.abs(a - r).max() / scale < 0.05, (a[:, :4], r[:, :4])
