"""int8-in-int32 PACKED KV cache: word packing, read-modify-write updates,
the XLA prefill/decode path, the Pallas decode kernel (interpret mode), and
the rebase shift.

The packed format stores the same per-(position, head) absmax int8 values as
the plain int8 cache, four consecutive sequence positions per int32 word
(KVCache docstring). It exists because 1-byte cache reads cap at ~390 GB/s
on v5e and Mosaic's i8->float converts are relayout-bound — the same
measurements that motivated the int4/int8 weight packing (CLAUDE.md).
Reference counterpart: the reference's int8 KV has no analogue (its cache is
fp16, fam/llm/fast_model.py KVCache); this is a TPU serving-capacity lever.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q8 = jnp.asarray(rng.integers(-127, 128, size=(16, 2, 3, 8), dtype=np.int8))
    words = tfm.pack_kv_s(q8)
    assert words.shape == (4, 2, 3, 8) and words.dtype == jnp.int32
    back = tfm.unpack_kv_s(words)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q8, dtype=np.int32))


@pytest.mark.parametrize("pos", [0, 1, 2, 3, 5, 56, 57])
def test_packed_kv_update_any_alignment(pos):
    """RMW write of T rows at any position: written bytes exact, every
    other byte of the touched words preserved."""
    rng = np.random.default_rng(pos)
    L, S, B, H, Dh = 2, 64, 1, 2, 8
    base8 = rng.integers(-127, 128, size=(L, S, B, H, Dh), dtype=np.int8)
    words = jax.vmap(tfm.pack_kv_s)(jnp.asarray(base8))
    t = 7
    newr = rng.integers(-127, 128, size=(t, B, H, Dh), dtype=np.int8)
    li = jnp.asarray(1, jnp.int32)
    out = tfm.packed_kv_update(words, jnp.asarray(newr), li, jnp.asarray(pos, jnp.int32))
    got = np.asarray(jax.vmap(tfm.unpack_kv_s)(out))
    want = base8.astype(np.int32).copy()
    want[1, pos : pos + t] = newr.astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pos", [0, 3, 41])
def test_packed_scale_update_any_alignment(pos):
    rng = np.random.default_rng(100 + pos)
    L, S, BH, BHP = 2, 64, 4, 128
    base = rng.random((L, 4, S // 4, 1, BHP)).astype(np.float32)
    t = 6
    new = rng.random((t, BH)).astype(np.float32)
    li = jnp.asarray(0, jnp.int32)
    out = np.asarray(
        tfm.packed_scale_update(
            jnp.asarray(base), jnp.asarray(new), li, jnp.asarray(pos, jnp.int32)
        )
    )
    want = base.copy()
    for i in range(t):
        p = pos + i
        row = np.zeros(BHP, np.float32)
        row[:BH] = new[i]
        want[0, p % 4, p // 4, 0] = row
    np.testing.assert_array_equal(out, want)


def test_packed_cache_create_shapes():
    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    kv = tfm.KVCache.create(tiny, 2, 64, dtype="int8_packed")
    assert kv.packed and kv.quantized
    assert kv.k.shape == (2, 16, 2, 4, 32) and kv.k.dtype == jnp.int32
    assert kv.k_scale.shape == (2, 4, 16, 1, 128)
    assert kv.max_seq_len == 64


def test_packed_forward_matches_int8_cache():
    """Prefill + one decode step: the packed cache stores bit-identical
    int8 values/scales to the plain int8 cache, so the XLA path's logits
    must match (same dequantized operands, same attention math)."""
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
        # a decode step at a non-4-aligned position exercises the RMW path
        logits2, _ = tfm.forward(
            params, tiny, idx[:, :1], spk_emb=spk, kv_cache=cache, cache_pos=9,
            compute_dtype=jnp.float32,
        )
        return np.asarray(logits[0]), np.asarray(logits2[0])

    p1, p2 = run(tfm.KVCache.create(tiny, 1, 64, dtype="int8_packed"))
    i1, i2 = run(tfm.KVCache.create(tiny, 1, 64, dtype=jnp.int8))
    np.testing.assert_allclose(p1, i1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p2, i2, rtol=1e-5, atol=1e-5)


def _pack_cache(k_q, k_s, bh):
    """(L,S,B,H,Dh) int8 + (L,S,B,H,1) f32 -> packed words + residue table."""
    L, S = k_q.shape[:2]
    words = jax.vmap(tfm.pack_kv_s)(k_q)
    flat = np.asarray(k_s, np.float32).reshape(L, S, bh)
    bhp = tfm.kv_scale_width(bh)
    table = np.zeros((L, S, bhp), np.float32)
    table[..., :bh] = flat
    table = table.reshape(L, S // 4, 4, bhp).transpose(0, 2, 1, 3)[:, :, :, None, :]
    return words, jnp.asarray(np.ascontiguousarray(table))


@pytest.mark.parametrize("pos", [0, 77, 300])
def test_attention_block_int4_packed_cache_interpret(pos):
    """Packed-cache kernel == bf16-cache kernel on the dequantized cache
    (same tolerance as the plain int8-cache test), and the RMW write lands
    the new row's byte without disturbing its word neighbours."""
    rng = np.random.default_rng(6)
    b, h, dh, s, L = 2, 8, 128, 512, 2
    d = h * dh
    xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.05)
    qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]
    layer = jnp.asarray(1, jnp.int32)
    pos_a = jnp.asarray(pos, jnp.int32)

    kf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    vf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
    k_q, k_s = tfm.quantize_kv_rows(jnp.asarray(kf))
    v_q, v_s = tfm.quantize_kv_rows(jnp.asarray(vf))
    k_deq = (k_q.astype(jnp.float32) * k_s).astype(jnp.bfloat16)
    v_deq = (v_q.astype(jnp.float32) * v_s).astype(jnp.bfloat16)
    kw, kt = _pack_cache(k_q, k_s, b * h)
    vw, vt = _pack_cache(v_q, v_s, b * h)

    yp, kcp, vcp, ksp, vsp = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        kw, vw, layer, pos_a, n_head=h, tile=512, interpret=True,
        k_scale=kt, v_scale=vt,
    )
    y16, kc16, _, _, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_deq, v_deq, layer, pos_a, n_head=h, tile=512, interpret=True,
    )
    ap, a16 = np.asarray(yp, dtype=np.float32), np.asarray(y16, dtype=np.float32)
    scale = np.abs(a16).max() + 1e-6
    np.testing.assert_allclose(ap, a16, atol=0.04 * scale, rtol=0.1)

    # the new row: byte pos%4 of word pos//4 rewritten, neighbours intact
    got = np.asarray(jax.vmap(tfm.unpack_kv_s)(kcp))  # (L, S, B, H, Dh) i32
    base = np.asarray(k_q, dtype=np.int32)
    new_scale = np.asarray(ksp)[1, pos % 4, pos // 4, 0, : b * h]
    assert (new_scale > 0).all()
    row_deq = got[1, pos].reshape(b * h, dh) * new_scale[:, None]
    row16 = np.asarray(kc16[1, pos]).astype(np.float32).reshape(b * h, dh)
    np.testing.assert_allclose(row_deq, row16, atol=0.03 * np.abs(row16).max() + 1e-3)
    # untouched positions of the same word and the rest of the cache
    mask = np.ones(s, bool)
    mask[pos] = False
    np.testing.assert_array_equal(got[1, mask], base[1, mask])
    np.testing.assert_array_equal(got[0], base[0])


def test_attention_block_int4_packed_large_batch_interpret():
    """Batched-serving shape (16 CFG rows x 16 heads): chunk < 128 and the
    residue-split scale DMA at arbitrary word offsets."""
    rng = np.random.default_rng(7)
    b, h, dh, s, L = 16, 16, 128, 128, 1
    d = h * dh
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
    kw, kt = _pack_cache(k_q, k_s, b * h)
    vw, vt = _pack_cache(v_q, v_s, b * h)
    pos_a = jnp.asarray(77, jnp.int32)  # mid-chunk, residue 1
    layer = jnp.asarray(0, jnp.int32)

    yp, _, _, ksp, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        kw, vw, layer, pos_a, n_head=h, tile=512, interpret=True,
        k_scale=kt, v_scale=vt,
    )
    y16, _, _, _, _ = A.decode_attention_block_int4(
        xa,
        qp["wqkv"]["pw"], qp["wqkv"]["sc"],
        qp["wo"]["pw"], qp["wo"]["sc"],
        k_deq, v_deq, layer, pos_a, n_head=h, tile=512, interpret=True,
    )
    ap, a16 = np.asarray(yp, dtype=np.float32), np.asarray(y16, dtype=np.float32)
    scale = np.abs(a16).max() + 1e-6
    np.testing.assert_allclose(ap, a16, atol=0.04 * scale, rtol=0.1)
    assert (np.asarray(ksp)[0, 77 % 4, 77 // 4, 0] > 0).all()


def test_packed_kv_cache_generate_cpu():
    """Tiny-model generate end-to-end with the packed cache (XLA path)."""
    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), tiny)
    out = fs.generate(
        params, tiny, np.arange(5) + 50, jnp.ones((256,)),
        key=jax.random.PRNGKey(3), max_new_tokens=8, end_of_audio_token=96,
        prompt_pad_multiple=8, cache_dtype="int8_packed",
    )
    assert all(0 <= t < 97 for t in out)


def test_packed_generate_matches_int8_cache_generate():
    """Same int8 values in both formats -> identical sampled tokens."""
    tiny = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), tiny)

    def run(cd):
        return fs.generate(
            params, tiny, np.arange(5) + 50, jnp.ones((256,)),
            key=jax.random.PRNGKey(3), max_new_tokens=8, end_of_audio_token=96,
            prompt_pad_multiple=8, cache_dtype=cd,
        )

    assert np.array_equal(np.asarray(run("int8_packed")), np.asarray(run(jnp.int8)))


def test_shift_packed_matches_unpacked_shift():
    """A 4-aligned shift of the packed cache == packing the shifted int8
    cache (bit-exact), and the residue tables follow."""
    rng = np.random.default_rng(9)
    L, S, B, H, Dh = 2, 256, 1, 2, 8
    base8 = rng.integers(-127, 128, size=(L, S, B, H, Dh), dtype=np.int8)
    words = jax.vmap(tfm.pack_kv_s)(jnp.asarray(base8))
    shift, pos = 128, 200
    kk, vv = fs.shift_cache_left_packed(
        words, words + 0, jnp.asarray(shift, jnp.int32), jnp.asarray(pos, jnp.int32)
    )
    got = np.asarray(jax.vmap(tfm.unpack_kv_s)(kk))
    want = base8.astype(np.int32)
    # valid prefix [shift, pos) must land at [0, pos-shift)
    np.testing.assert_array_equal(
        got[:, : pos - shift], want[:, shift:pos]
    )

    table = rng.random((L, 4, S // 4, 1, 128)).astype(np.float32)
    ks, vs = fs.shift_scales_left_packed(
        jnp.asarray(table), jnp.asarray(table) + 0,
        jnp.asarray(shift, jnp.int32), jnp.asarray(pos, jnp.int32),
    )
    got_t = np.asarray(ks)
    np.testing.assert_array_equal(
        got_t[:, :, : (pos - shift) // 4],
        table[:, :, shift // 4 : shift // 4 + (pos - shift + 3) // 4],
    )


# ---------------------------------------------------------------------------
# Mid-flight join (continuous serving engine) with the packed cache
# ---------------------------------------------------------------------------


def _pos_view(table):
    """(L, 4, Sw, 1, W) residue-split scale table -> (L, S, W) position-major."""
    l, _, sw, _, w = table.shape
    return np.transpose(table[:, :, :, 0], (0, 2, 1, 3)).reshape(l, sw * 4, w)


@pytest.mark.parametrize("phys_start", [0, 1, 2, 3, 37, 44])
def test_merge_slot_cache_packed_oracle(phys_start):
    """Byte-granular landing of packed temp rows at ANY physical offset:
    unpacking the merged cache == writing the temp int8 values into the
    unpacked big cache at [phys_start, phys_start+T) of the target rows."""
    rng = np.random.default_rng(phys_start)
    L, S, ROWS, H, Dh = 2, 64, 4, 2, 8
    T = 16
    big8 = rng.integers(-127, 128, size=(L, S, ROWS, H, Dh), dtype=np.int8)
    tmp8 = rng.integers(-127, 128, size=(L, T, 2, H, Dh), dtype=np.int8)
    bigw = jax.vmap(tfm.pack_kv_s)(jnp.asarray(big8))
    tmpw = jax.vmap(tfm.pack_kv_s)(jnp.asarray(tmp8))
    row_c, row_u = 1, 3
    k, v = fs.merge_slot_cache_packed(
        bigw, bigw + 0, tmpw, tmpw + 0,
        jnp.asarray(phys_start, jnp.int32),
        jnp.asarray(row_c, jnp.int32), jnp.asarray(row_u, jnp.int32),
    )
    got = np.asarray(jax.vmap(tfm.unpack_kv_s)(k))
    want = big8.astype(np.int32).copy()
    want[:, phys_start : phys_start + T, row_c] = tmp8[:, :, 0]
    want[:, phys_start : phys_start + T, row_u] = tmp8[:, :, 1]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(jax.vmap(tfm.unpack_kv_s)(v)), want)


@pytest.mark.parametrize("phys_start", [0, 3, 37])
def test_merge_slot_scales_packed_oracle(phys_start):
    rng = np.random.default_rng(100 + phys_start)
    L, S, H = 2, 64, 2
    ROWS = 4  # 2B
    T = 16
    W = tfm.kv_scale_width(ROWS * H)
    Wt = tfm.kv_scale_width(2 * H)
    big = rng.random((L, 4, S // 4, 1, W)).astype(np.float32)
    tmp = rng.random((L, 4, T // 4, 1, Wt)).astype(np.float32)
    row_c, row_u = 0, 2
    ks, vs = fs.merge_slot_scales_packed(
        jnp.asarray(big), jnp.asarray(big) + 0,
        jnp.asarray(tmp), jnp.asarray(tmp) + 0,
        jnp.asarray(phys_start, jnp.int32),
        jnp.asarray(row_c, jnp.int32), jnp.asarray(row_u, jnp.int32), H,
    )
    got = _pos_view(np.asarray(ks))
    want = _pos_view(big).copy()
    tmp_pos = _pos_view(tmp)
    want[:, phys_start : phys_start + T, row_c * H : row_c * H + H] = tmp_pos[:, :, 0:H]
    want[:, phys_start : phys_start + T, row_u * H : row_u * H + H] = tmp_pos[:, :, H : 2 * H]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(_pos_view(np.asarray(vs)), want)


def test_midflight_join_packed_matches_fresh_decode():
    """test_engine.py::test_midflight_join_matches_fresh_decode, packed-cache
    variant: per-(position, head) absmax quantization is identical in the
    2-row temp cache and the big cache, so a joined packed decode reproduces
    the solo packed decode bit-exactly (greedy sampling)."""
    cfg = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=256, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spkA = jax.random.normal(jax.random.PRNGKey(1), (cfg.speaker_emb_dim,))
    spkB = jax.random.normal(jax.random.PRNGKey(2), (cfg.speaker_emb_dim,))
    promptA = [90, 91, 92, 93]
    promptB = [94, 95, 96, 90, 91]
    N = 24
    EOA = 10**6
    greedy = dict(temperature=0.01, top_p=0.01)

    solo = fs.generate_batch(
        params, cfg, [promptB], jnp.asarray(spkB)[None], key=jax.random.PRNGKey(5),
        max_new_tokens=N, end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32, cache_dtype="int8_packed", **greedy,
    )[0]

    slots = 2
    kv = tfm.KVCache.create(cfg, 2 * slots, cfg.block_size, dtype="int8_packed")
    pm = 16
    padded, pads = fs.left_pad_prompts([promptA, [0]], pm)
    t1 = jnp.full((slots, 1), 0.01, jnp.float32)
    tp = jnp.full((slots, 1), 0.01, jnp.float32)
    g = jnp.full((slots, 1), 3.0, jnp.float32)
    spk = jnp.stack([jnp.asarray(spkA), jnp.zeros_like(jnp.asarray(spkA))])
    first, kv = fs.prefill_batch(
        params, cfg, jnp.asarray(padded), jnp.asarray(pads), spk, kv,
        jax.random.PRNGKey(6), t1, tp, g, compute_dtype=jnp.float32,
    )
    cur = np.asarray([int(np.asarray(first)[0]), 0], np.int32)
    pos = pm
    buf, lens, kv = fs.decode_batch(
        params, cfg, jnp.asarray(cur), jnp.asarray(pos, jnp.int32),
        jnp.asarray(pads), spk, kv, jax.random.PRNGKey(7), t1, tp, g,
        jnp.asarray(14, jnp.int32), 14, EOA, jnp.float32,
    )
    pos += 14  # NOT a multiple of 4: the join lands at an unaligned offset

    bucket = 16
    temp = tfm.KVCache.create(cfg, 2, bucket, dtype="int8_packed")
    pb, pbl = fs.left_pad_prompts([promptB], bucket)
    firstB, temp = fs.prefill_batch(
        params, cfg, jnp.asarray(pb), jnp.asarray(pbl),
        jnp.asarray(spkB)[None], temp, jax.random.PRNGKey(8),
        t1[:1], tp[:1], g[:1], compute_dtype=jnp.float32,
    )
    k, v = fs.merge_slot_cache_packed(
        kv.k, kv.v, temp.k, temp.v,
        jnp.asarray(pos - bucket, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(slots + 1, jnp.int32),
    )
    ks, vs = fs.merge_slot_scales_packed(
        kv.k_scale, kv.v_scale, temp.k_scale, temp.v_scale,
        jnp.asarray(pos - bucket, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(slots + 1, jnp.int32),
        cfg.n_head,
    )
    kv = tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
    spk = spk.at[1].set(jnp.asarray(spkB))
    pads = np.asarray(pads).copy()
    pads[1] = pos - len(promptB)
    cur = np.asarray([int(np.asarray(buf)[0, -1]), int(np.asarray(firstB)[0])], np.int32)

    joined = [int(np.asarray(firstB)[0])]
    for _ in range(3):
        buf, lens, kv = fs.decode_batch(
            params, cfg, jnp.asarray(cur), jnp.asarray(pos, jnp.int32),
            jnp.asarray(pads), spk, kv, jax.random.PRNGKey(9), t1, tp, g,
            jnp.asarray(8, jnp.int32), 8, EOA, jnp.float32,
        )
        b = np.asarray(buf)
        joined.extend(int(x) for x in b[1, : int(np.asarray(lens)[1])])
        cur = np.asarray([b[0, -1], b[1, -1]], np.int32)
        pos += 8

    np.testing.assert_array_equal(
        np.asarray(joined[:N], np.int32), np.asarray(solo[:N], np.int32)
    )


def test_engine_end_to_end_packed_cache(tmp_path):
    """The continuous-batching engine serves with kv_cache_dtype='int8_packed'
    (packed prefill, packed segment decode, packed join merge)."""
    from metavoice_tpu.runtime.engine import BatchingEngine
    from metavoice_tpu.runtime.tts import TTS
    from metavoice_tpu.utils import audio_io as aio

    sr = 16000
    t = np.arange(31 * sr) / sr
    ref = str(tmp_path / "ref.wav")
    aio.write_wav(ref, (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
    tts = TTS.from_random(
        jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path),
        kv_cache_dtype="int8_packed",
    )
    assert tts._kv_cache.packed
    eng = BatchingEngine(tts, max_batch=2, batch_window_s=0.05)
    try:
        futs = [
            eng.submit(f"hello world {i}", ref, max_new_tokens=24)
            for i in range(3)
        ]
        paths = [f.result(timeout=300) for f in futs]
    finally:
        eng.shutdown()
    for p in paths:
        wav, got_sr = aio.read_wav(p)
        assert wav.size > 0


def test_engine_rebase_packed_cache(tmp_path, monkeypatch):
    """Sustained load with the packed cache: the engine rebases via the
    word-aligned packed shifts (shift_cache_left_packed) and completes every
    request without truncation — the packed analogue of
    test_engine.py::test_engine_rebase_under_sustained_load."""
    import os as _os

    from metavoice_tpu.core import tokens as Tok
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine
    from metavoice_tpu.runtime.tts import TTS
    from metavoice_tpu.utils import audio_io as aio

    sr = 16000
    t = np.arange(31 * sr) / sr
    ref = str(tmp_path / "ref.wav")
    aio.write_wav(ref, (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
    monkeypatch.setattr(Tok, "END_OF_AUDIO_TOKEN", 10**6)  # run to max_new_tokens
    tts = TTS.from_random(
        jax.random.PRNGKey(7), small=True, output_dir=str(tmp_path),
        kv_cache_dtype="int8_packed",
    )
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=16, rebase_margin=448)
    try:
        futs = [
            eng.submit(f"Sustained packed load {i}.", ref, max_new_tokens=32 + (i % 4) * 24)
            for i in range(8)
        ]
        for f in futs:
            assert _os.path.exists(f.result(timeout=900))
        assert eng.stats["rebases"] >= 1, eng.stats
        assert eng.stats["truncations"] == 0, eng.stats
    finally:
        eng.shutdown()


def test_cache_dtype_string_aliases():
    """String cache dtypes are MODE selectors: 'int8' builds the scale-table
    cache (never a scale-less raw int8 one), unknown strings raise."""
    cfg = first_stage_config(n_layer=2, n_head=2, dim=64, block_size=64)
    kv = tfm.KVCache.create(cfg, 2, 64, dtype="int8")
    assert kv.quantized and not kv.packed and kv.k.dtype == jnp.int8
    with pytest.raises(ValueError, match="unknown KV cache dtype string"):
        tfm.KVCache.create(cfg, 2, 64, dtype="int9")


def test_engine_rejects_unaligned_pad_multiple_with_packed_cache(tmp_path):
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine
    from metavoice_tpu.runtime.tts import TTS

    tts = TTS.from_random(
        jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path),
        kv_cache_dtype="int8_packed",
    )
    with pytest.raises(ValueError, match="multiple of 4"):
        ContinuousBatchingEngine(tts, slots=2, pad_multiple=6)
