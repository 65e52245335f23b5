"""Quantization math + Pallas kernel (interpret mode) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import quantized as qz


def test_int8_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, s = qz.quantize_int8(w)
    assert q.dtype == jnp.int8
    deq = qz.dequantize_int8(q, s)
    # per-channel max error <= scale/2
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_int4_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    q, s, z = qz.quantize_int4_grouped(w, groupsize=128)
    assert int(q.min()) >= -8 and int(q.max()) <= 7
    deq = qz.dequantize_int4_grouped(q, s, z, groupsize=128)
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s).repeat(128, axis=0) * 0.5 + 1e-5).all()


def test_int8_matmul_reference_matches_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, s = qz.quantize_int8(w)
    out_q = np.asarray(qz.matmul_int8_reference(x, q, s))
    out_d = np.asarray(x @ w)
    # quantization noise only
    assert np.abs(out_q - out_d).max() < 0.15 * np.abs(out_d).max() + 0.1


def test_int8_pallas_kernel_interpret():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 512)).astype(np.float32))
    q, s = qz.quantize_int8(w)
    ref = np.asarray(qz.matmul_int8_reference(x, q, s))
    out = np.asarray(qz.matmul_int8(x, q, s, tile_n=256, interpret=True))
    # kernel accumulates bf16 x bf16 -> f32 on the MXU; reference is full f32
    np.testing.assert_allclose(out, ref, atol=0.2, rtol=0.05)


def test_int4_pallas_kernel_interpret():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    q, s, z = qz.quantize_int4_grouped(w, groupsize=128)
    ref = np.asarray(qz.matmul_int4_reference(x, q, s, z, groupsize=128))
    out = np.asarray(
        qz.matmul_int4(x, q, s, z, groupsize=128, tile_n=256, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=0.1, rtol=0.1)


def test_quantize_params_int8_structure():
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm

    cfg = first_stage_config(n_layer=2, n_head=2, dim=32, block_size=16, vocab_sizes=(40,))
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    qp = qz.quantize_params_int8(params)
    assert set(qp["layers"]["wqkv"].keys()) == {"q", "scales"}
    assert qp["layers"]["wqkv"]["q"].shape == params["layers"]["wqkv"].shape
    assert qp["layers"]["wqkv"]["q"].dtype == jnp.int8
    # non-matmul leaves untouched
    assert qp["layers"]["attn_norm_w"] is params["layers"]["attn_norm_w"]
    assert qp["wtes"][0] is params["wtes"][0]


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.integers(-8, 8, size=(256, 64)).astype(np.int8))
    p = qz.pack_int4(q)
    assert p.shape == (128, 64) and p.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(qz.unpack_int4(p)), np.asarray(q))


def test_int4_packed_kernel_interpret():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    q, s, z = qz.quantize_int4_grouped(w, groupsize=128)
    p = qz.pack_int4(q)
    ref = np.asarray(qz.matmul_int4_reference(x, q, s, z, groupsize=128))
    out = np.asarray(
        qz.matmul_int4_packed(x, p, s, z, groupsize=128, tile_n=256, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=0.2, rtol=0.05)


def test_quantize_params_int4_packed_structure():
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm

    cfg = first_stage_config(n_layer=2, n_head=2, dim=256, block_size=16, vocab_sizes=(40,))
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    qp = qz.quantize_params_int4_packed(params, groupsize=128)
    assert set(qp["layers"]["wqkv"].keys()) == {"p", "scales", "zeros"}
    l, k, n = params["layers"]["wqkv"].shape
    assert qp["layers"]["wqkv"]["p"].shape == (l, k // 2, n)
    # forward runs via the reference path on CPU
    idx = jnp.zeros((1, 4), jnp.int32)
    logits, _ = tfm.forward(qp, cfg, idx, spk_emb=jnp.ones((1, 256)), compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits[0])).all()


def test_ffn_int8_fused_kernel_interpret():
    rng = np.random.default_rng(7)
    d, i = 128, 512
    x = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(d, i)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(d, i)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))
    q1, s1 = qz.quantize_int8(w1)
    q3, s3 = qz.quantize_int8(w3)
    q2, s2 = qz.quantize_int8(w2)
    ref = np.asarray(qz.ffn_int8_reference(x, q1, s1, q3, s3, q2, s2))
    out = np.asarray(
        qz.ffn_int8(x, q1, s1, q3, s3, q2, s2, tile_i=256, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=0.02 * scale, rtol=0.05)
