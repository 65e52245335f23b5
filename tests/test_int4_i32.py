"""int4-in-int32 serving format: packing, reference semantics, and the
decode megakernels (interpret mode) against the jnp oracles.

Reference counterpart: fam/llm/fast_quantize.py int4 groupwise quantization
(g=128) executed by aten._weight_int4pack_mm; here the same qparam math is
repacked eight-nibbles-per-i32-word for TPU HBM/VPU efficiency
(ops/quantized.py int4-in-int32 notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz


def test_pack_int4_i32_roundtrip():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, size=(1024, 16), dtype=np.int8))
    pw = qz.pack_int4_i32(q)
    assert pw.shape == (128, 16) and pw.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(qz.unpack_int4_i32(pw)), np.asarray(q))


def test_quantize_int4_i32_matches_grouped_dequant():
    """The i32 format must encode exactly the reference groupwise int4 math."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(1024, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 1024)).astype(np.float32))
    q, s, z = qz.quantize_int4_grouped(w, groupsize=128)
    ref = np.asarray(qz.matmul_int4_reference(x, q, s, z, groupsize=128))
    pw, sc = qz.quantize_int4_i32(w, groupsize=128)
    out = np.asarray(qz.matmul_int4_i32_reference(x, pw, sc, groupsize=128))
    # sc tables are stored bf16 (DMA bandwidth): equivalence up to bf16
    # rounding of the scale/constant rows, far below the int4 noise itself
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.01 * np.abs(ref).max())


def test_quantize_int4_i32_pads_unaligned_k():
    """in-dim not divisible by 8*groupsize zero-pads; result still matches a
    dense dequant matmul on the real rows."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(704, 16)).astype(np.float32))  # 5632/8 shape class
    x = jnp.asarray(rng.normal(size=(2, 704)).astype(np.float32))
    pw, sc = qz.quantize_int4_i32(w, groupsize=128)
    assert pw.shape[0] * 8 == 1024  # padded to 8*groupsize multiple
    out = np.asarray(qz.matmul_int4_i32_reference(x, pw, sc, groupsize=128))
    dense = np.asarray(x @ w)
    # int4 g=128 noise over a 704-length contraction: ~sqrt(K)*s/2 per output
    assert np.abs(out - dense).max() < 0.3 * np.abs(dense).max()
    # and the pad region contributes nothing: an x carrying energy only in
    # pad positions (impossible for real callers) is irrelevant, but the
    # packed K must not change the result vs truncating to the real rows
    x2 = jnp.pad(x, ((0, 0), (0, 1024 - 704)))
    out2 = np.asarray(qz.matmul_int4_i32_reference(x2, pw, sc, groupsize=128))
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-5)


def test_ffn_int4_kernel_interpret():
    rng = np.random.default_rng(3)
    d, inter, L = 1024, 768, 2  # inter pads to 1024 inside the quantizer
    x = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32) * 0.1)
    params = {
        "layers": {
            k: jnp.asarray(rng.normal(size=(L, *shape)).astype(np.float32) * 0.05)
            for k, shape in (
                ("w1", (d, inter)), ("w3", (d, inter)), ("w2", (inter, d)),
            )
        }
    }
    qp = qz.quantize_params_int4_i32(params)["layers"]
    for li in range(L):
        out = qz.decode_ffn_int4(
            x,
            qp["w1"]["pw"], qp["w1"]["sc"],
            qp["w3"]["pw"], qp["w3"]["sc"],
            qp["w2"]["pw"], qp["w2"]["sc"],
            jnp.asarray(li, jnp.int32),
            tile=512,
            interpret=True,
        )
        ref = qz.ffn_int4_i32_reference(
            x,
            qp["w1"]["pw"][li], qp["w1"]["sc"][li],
            qp["w3"]["pw"][li], qp["w3"]["sc"][li],
            qp["w2"]["pw"][li], qp["w2"]["sc"][li],
        )
        ref_np = np.asarray(ref)
        scale = np.abs(ref_np).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(out), ref_np, atol=0.03 * scale, rtol=0.05
        )


@pytest.mark.parametrize("pos", [0, 300])
def test_attention_block_int4_kernel_interpret(pos):
    rng = np.random.default_rng(4)
    b, h, dh, s, L = 2, 8, 128, 512, 2
    d = h * dh
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.05)
    qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]
    k_cache = jnp.asarray(rng.normal(size=(L, s, b, h, dh)).astype(np.float32), jnp.bfloat16)
    v_cache = jnp.asarray(rng.normal(size=(L, s, b, h, dh)).astype(np.float32), jnp.bfloat16)
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)

    y, kc, vc, _, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_cache, v_cache, layer, pos_a, n_head=h, tile=512, interpret=True,
    )

    # composed reference from already-validated pieces
    qkv = qz.matmul_int4_i32_reference(xa, qp["wqkv"]["pw"][1], qp["wqkv"]["sc"][1])
    q = qkv[:, :d].reshape(b, h, dh)
    k_new = qkv[:, d : 2 * d].reshape(b, h, dh)
    v_new = qkv[:, 2 * d :].reshape(b, h, dh)
    y_attn, kc_ref, vc_ref = A.decode_attention_reference(
        q.astype(jnp.float32), k_new, v_new,
        k_cache.astype(jnp.float32), v_cache.astype(jnp.float32), layer, pos_a,
    )
    ref = qz.matmul_int4_i32_reference(
        y_attn.reshape(b, d), qp["wo"]["pw"][1], qp["wo"]["sc"][1]
    )
    ref_np = np.asarray(ref)
    scale = np.abs(ref_np).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(y).astype(np.float32), ref_np, atol=0.05 * scale, rtol=0.05
    )
    # the new K/V row landed at (layer, pos)
    np.testing.assert_allclose(
        np.asarray(kc[1, pos]).astype(np.float32),
        np.asarray(k_new).astype(np.float32).reshape(b, h, dh),
        atol=0.02 * np.abs(np.asarray(k_new)).max() + 1e-3,
    )
    # the other layer's cache is untouched
    np.testing.assert_array_equal(np.asarray(kc[0]), np.asarray(k_cache[0]))


def test_int4_i32_forward_close_to_dense():
    """Full tiny-transformer forward through the _linear 'pw' path."""
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm

    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), tiny)
    qp = qz.quantize_params_int4_i32(params)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 97)
    spk = jnp.ones((1, 256))
    dense, _ = tfm.forward(params, tiny, idx, spk_emb=spk, compute_dtype=jnp.float32)
    quant, _ = tfm.forward(qp, tiny, idx, spk_emb=spk, compute_dtype=jnp.float32)
    d, q = np.asarray(dense[0]), np.asarray(quant[0])
    assert np.abs(d - q).max() / np.abs(d).max() < 0.25


def test_int4_i32_generate_end_to_end():
    """Cached decode (CPU reference path) runs and stays in-vocab."""
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import first_stage as fs

    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm_init = None
    from metavoice_tpu.models import transformer as tfm

    params = tfm.init_params(jax.random.PRNGKey(0), tiny)
    qp = qz.quantize_params_int4_i32(params)
    out = fs.generate(
        qp, tiny, np.arange(5) + 50, jnp.ones((256,)), key=jax.random.PRNGKey(3),
        max_new_tokens=8, end_of_audio_token=96, prompt_pad_multiple=8,
    )
    assert all(0 <= t < 97 for t in out)


def _pad_scales(s_arr, L, s, bh):
    """(L, s, ..., 1) absmax scales -> the kernel's (L, s, 1, bh_pad) table."""
    from metavoice_tpu.models import transformer as tfm

    flat = np.asarray(s_arr).reshape(L, s, 1, bh)
    out = np.zeros((L, s, 1, tfm.kv_scale_width(bh)), np.float32)
    out[..., :bh] = flat
    return jnp.asarray(out)


@pytest.mark.parametrize("pos", [0, 300])
def test_attention_block_int4_int8_cache_interpret(pos):
    """int8 KV cache: the kernel quantizes the new row in place and
    dequantizes streamed chunks; output matches the bf16-cache kernel run
    on the dequantized cache."""
    from metavoice_tpu.models import transformer as tfm

    rng = np.random.default_rng(6)
    b, h, dh, s, L = 2, 8, 128, 512, 2
    d = h * dh
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.05)
    qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)

    # build an int8 cache whose dequantized content equals the bf16 cache
    kf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    vf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    k_q, k_s = tfm.quantize_kv_rows(jnp.asarray(kf))
    v_q, v_s = tfm.quantize_kv_rows(jnp.asarray(vf))
    k_deq = (k_q.astype(jnp.float32) * k_s).astype(jnp.bfloat16)
    v_deq = (v_q.astype(jnp.float32) * v_s).astype(jnp.bfloat16)

    y8, kc8, vc8, ks8, vs8 = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_q, v_q, layer, pos_a, n_head=h, tile=512, interpret=True,
        k_scale=_pad_scales(k_s, L, s, b * h),
        v_scale=_pad_scales(v_s, L, s, b * h),
    )
    y16, kc16, vc16, _, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_deq, v_deq, layer, pos_a, n_head=h, tile=512, interpret=True,
    )
    a8, a16 = np.asarray(y8, dtype=np.float32), np.asarray(y16, dtype=np.float32)
    scale = np.abs(a16).max() + 1e-6
    # int8 cache noise on top of int4 weights: ~1% of full scale
    np.testing.assert_allclose(a8, a16, atol=0.04 * scale, rtol=0.1)
    # the new row was quantized and its scale written at (layer, pos)
    assert kc8.dtype == jnp.int8
    new_scale = np.asarray(ks8)[1, pos, 0, : b * h]
    assert (new_scale > 0).all()
    # dequantized new row matches the bf16-kernel's written row
    row8 = np.asarray(kc8[1, pos]).astype(np.float32).reshape(b * h, dh) * new_scale[:, None]
    row16 = np.asarray(kc16[1, pos]).astype(np.float32).reshape(b * h, dh)
    np.testing.assert_allclose(row8, row16, atol=0.03 * np.abs(row16).max() + 1e-3)


def test_attention_block_int4_int8_cache_large_batch_interpret():
    """Batched-serving shape (16 CFG rows x 16 heads -> chunk 32): the
    sequence-major scale tables must stream at arbitrary chunk offsets."""
    from metavoice_tpu.models import transformer as tfm

    rng = np.random.default_rng(7)
    b, h, dh, s, L = 16, 16, 128, 128, 1
    d = h * dh
    assert A._chunk_for(b * h, dh) < 128  # the case the old layout rejected
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.02)
    qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]

    kf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    vf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    k_q, k_s = tfm.quantize_kv_rows(jnp.asarray(kf))
    v_q, v_s = tfm.quantize_kv_rows(jnp.asarray(vf))
    k_deq = (k_q.astype(jnp.float32) * k_s).astype(jnp.bfloat16)
    v_deq = (v_q.astype(jnp.float32) * v_s).astype(jnp.bfloat16)
    pos_a = jnp.asarray(77, jnp.int32)  # mid-chunk, not 128-aligned
    layer = jnp.asarray(0, jnp.int32)

    y8, kc8, _, ks8, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_q, v_q, layer, pos_a, n_head=h, tile=512, interpret=True,
        k_scale=_pad_scales(k_s, L, s, b * h),
        v_scale=_pad_scales(v_s, L, s, b * h),
    )
    y16, _, _, _, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_deq, v_deq, layer, pos_a, n_head=h, tile=512, interpret=True,
    )
    a8, a16 = np.asarray(y8, dtype=np.float32), np.asarray(y16, dtype=np.float32)
    scale = np.abs(a16).max() + 1e-6
    np.testing.assert_allclose(a8, a16, atol=0.04 * scale, rtol=0.1)
    new_scale = np.asarray(ks8)[0, 77, 0]
    assert (new_scale > 0).all()


def test_int8_kv_cache_generate_cpu():
    """Tiny-model generate with the quantized cache (non-fused CPU path)."""
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import first_stage as fs
    from metavoice_tpu.models import transformer as tfm

    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), tiny)
    kv8 = tfm.KVCache.create(tiny, 2, 64, dtype=jnp.int8)
    assert kv8.quantized and kv8.k.dtype == jnp.int8
    assert kv8.k_scale.shape == (2, 64, 1, 128)  # BH=8 lane-padded to 128
    out = fs.generate(
        params, tiny, np.arange(5) + 50, jnp.ones((256,)),
        key=jax.random.PRNGKey(3), max_new_tokens=8, end_of_audio_token=96,
        prompt_pad_multiple=8, cache_dtype=jnp.int8,
    )
    assert all(0 <= t < 97 for t in out)


def test_int8_kv_cache_forward_close_to_bf16():
    """Cached forward with int8 cache tracks the bf16-cache forward."""
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm

    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), tiny)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 97)
    spk = jnp.ones((1, 256))

    def run(cache):
        logits, cache = tfm.forward(
            params, tiny, idx, spk_emb=spk, kv_cache=cache, cache_pos=0,
            compute_dtype=jnp.float32,
        )
        # one cached decode step on top
        logits2, _ = tfm.forward(
            params, tiny, idx[:, :1], spk_emb=spk, kv_cache=cache, cache_pos=8,
            compute_dtype=jnp.float32,
        )
        return np.asarray(logits2[0])

    out16 = run(tfm.KVCache.create(tiny, 1, 64, dtype=jnp.float32))
    out8 = run(tfm.KVCache.create(tiny, 1, 64, dtype=jnp.int8))
    denom = np.abs(out16).max()
    assert np.abs(out16 - out8).max() / denom < 0.05


@pytest.mark.parametrize("m", [1, 8, 200, 300])
def test_prefill_matmul_matches_reference(m):
    """M-tiled prefill kernel == jnp reference (packed weights, grid over
    (m_tiles, n_tiles), in-register dequant)."""
    rng = np.random.default_rng(m)
    k, n = 1024, 512
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
    pw, sc = qz.quantize_int4_i32(w)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.5)
    ref = qz.matmul_int4_i32_reference(x, pw, sc)
    out = qz.matmul_int4_i32(x, pw, sc, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=0.05 * float(jnp.abs(ref).max()), rtol=0.05
    )


def test_chunkv2_bit_identical_to_base_loop(monkeypatch):
    """The transpose-free attention chunk loop (MVTPU_STACK_CHUNKV2=1, the
    default) must be bit-identical to the transposing formulation on the
    int4 block kernel, for both the bf16 and the int8 KV cache."""
    from metavoice_tpu.models import transformer as tfm

    rng = np.random.default_rng(11)
    b, h, dh, s, L = 2, 8, 128, 256, 1
    d = h * dh
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.05)
    qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]
    layer = jnp.asarray(0, jnp.int32)
    pos_a = jnp.asarray(130, jnp.int32)
    starts = jnp.asarray([2, 0], jnp.int32)
    kf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    vf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    k_q, k_s = tfm.quantize_kv_rows(jnp.asarray(kf))
    v_q, v_s = tfm.quantize_kv_rows(jnp.asarray(vf))

    def run(v2):
        monkeypatch.setenv("MVTPU_STACK_CHUNKV2", v2)
        outs = []
        r = A.decode_attention_block_int4(
            xa, qp["wqkv"]["pw"], qp["wqkv"]["sc"], qp["wo"]["pw"], qp["wo"]["sc"],
            jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
            layer, pos_a, n_head=h, starts=starts, tile=512, interpret=True)
        outs += [np.asarray(t) for t in r if t is not None]
        r = A.decode_attention_block_int4(
            xa, qp["wqkv"]["pw"], qp["wqkv"]["sc"], qp["wo"]["pw"], qp["wo"]["sc"],
            k_q, v_q, layer, pos_a, n_head=h, starts=starts, tile=512, interpret=True,
            k_scale=_pad_scales(k_s, L, s, b * h),
            v_scale=_pad_scales(v_s, L, s, b * h))
        outs += [np.asarray(t) for t in r if t is not None]
        return outs

    base, v2 = run("0"), run("1")
    assert len(base) == len(v2)
    for x, y in zip(base, v2):
        assert np.array_equal(x, y)


def test_matmul_int8_i32_kernel_matches_reference():
    """Standalone p8 Pallas matmul (prefill + TP per-shard decode path)
    == the jnp reference, interpret mode."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (256, 256), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 256), jnp.bfloat16)
    pw, sc = qz.quantize_int8_i32(w)
    ref = qz.matmul_int8_i32_reference(x, pw, sc)
    out = qz.matmul_int8_i32(x, pw, sc, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_matmul_int8_i32_large_m_tiled():
    """M above the prefill tile exercises the M-grid path."""
    w = jax.random.normal(jax.random.PRNGKey(5), (128, 384), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (300, 128), jnp.bfloat16)
    pw, sc = qz.quantize_int8_i32(w)
    ref = qz.matmul_int8_i32_reference(x, pw, sc)
    out = qz.matmul_int8_i32(x, pw, sc, interpret=True)
    # fp-order noise only: s*sum(x*b) (kernel) vs sum(x*(s*b)) (reference)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.6, rtol=0.1,
    )


def test_linear_off_grid_k_pads_activations():
    """_linear with off-packer-grid K (e.g. a 1280-dim distilled draft).

    The int4 packer pads K to 8*groupsize (1024) multiples, the int8 packer
    to multiples of 4; _linear must zero-pad the activations to the packed K
    before dispatching (the pad rows are numerically inert). Exercises the
    reference paths (CPU) for both formats and the oracle's own x-padding.
    """
    from metavoice_tpu.models import transformer as tfm

    rng = np.random.default_rng(11)
    for k, quant, keys, tol in (
        (1280, qz.quantize_int4_i32, ("pw", "sc"), 0.12),
        (1282, qz.quantize_int4_i32, ("pw", "sc"), 0.12),
        (1282, qz.quantize_int8_i32, ("p8", "sc8"), 0.03),
    ):
        w = jnp.asarray(rng.normal(size=(k, 256)) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(1, k)), jnp.bfloat16)
        oracle = np.asarray(
            jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
        )
        packed = quant(w)
        y = np.asarray(
            tfm._linear(x, dict(zip(keys, packed))).astype(jnp.float32)
        )
        err = np.abs(y - oracle).max() / (np.abs(oracle).max() + 1e-9)
        assert err < tol, (keys[0], k, err)
