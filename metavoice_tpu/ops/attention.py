"""Fused decode attention (flash-decoding) Pallas TPU kernel.

The XLA decode-attention path costs ~8 small ops per layer (two cache
updates, two dynamic-index reads, two einsums, masked softmax, reshape) and
always streams the FULL (S, B, H, Dh) cache from HBM. This kernel replaces
all of it with ONE Pallas call per layer that:

  * writes the step's new K/V row into the HBM cache in place
    (input/output aliasing — no cache copy),
  * streams only the *valid* prefix ``[0, pos]`` of the cache through VMEM
    in double-buffered chunks (a dynamic trip-count ``fori_loop`` — XLA
    can't do this, its masked reads still fetch all S slots),
  * runs the online-softmax (flash) accumulation in f32 on the VPU,

which both cuts per-step HBM traffic (the cache read scales with the
current length, not the block size) and collapses the op-count overhead.

Reference counterpart: F.scaled_dot_product_attention on a full static cache
(fam/llm/fast_model.py:217-222), "KV-caching via Flash Decoding" claimed at
reference README.md:170.

Layout: cache is sequence-major (L, S, B, H, Dh) as in models/transformer.
The kernel is called per layer with the full cache ref + a scalar layer
index; DMA slices pick the layer without materializing it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # default cache slots per DMA chunk (batch 1-2)


def _chunk_for(bh: int, dh: int) -> int:
    """Cache-chunk length that keeps the double-buffered K+V chunk buffers
    around 8 MB of VMEM regardless of batch size (power of two, >= 32)."""
    budget_elems = 8 * 1024 * 1024 // (2 * 2 * 2)  # bytes/(bf16 * 2 bufs * k+v)
    c = budget_elems // max(bh * dh, 1)
    c = 1 << max(5, min(8, c.bit_length() - 1))
    return c


def _chunkv2_enabled() -> bool:
    """Transpose-free chunk-loop layout (scores stay (C, BH); softmax stats
    ride the loop carry as (1, BH) rows). Measured on v5e: +6-8% batch-8
    aggregate decode, ~+2% single-stream, bit-identical results — the
    per-chunk (C, BH)<->(BH, C) relayouts were the VPU cost the perf notes
    blamed for the ~180 GB/s ceiling at large batch*heads. Env kill-switch
    for A/B: MVTPU_STACK_CHUNKV2=0."""
    import os

    return os.environ.get("MVTPU_STACK_CHUNKV2", "1") == "1"


def _decode_attn_kernel(
    chunk,
    chunkv2,
    # scalar prefetch
    idx_ref,  # (3,) int32: [layer, pos, min_start]
    # inputs
    q_ref,  # (BH, Dh) VMEM
    k_new_ref,  # (1, BH, Dh) VMEM
    v_new_ref,  # (1, BH, Dh) VMEM
    starts_ref,  # (BH, 1) int32 VMEM: per-row first valid cache slot
    k_hbm,  # (L, S, BH, Dh) HBM   (aliased output)
    v_hbm,  # (L, S, BH, Dh) HBM   (aliased output)
    # outputs
    y_ref,  # (BH, Dh) VMEM
    k_out,  # aliased with k_hbm
    v_out,  # aliased with v_hbm
    # scratch
    k_buf,  # (2, CHUNK, BH, Dh) VMEM
    v_buf,  # (2, CHUNK, BH, Dh) VMEM
    acc_ref,  # (BH, Dh) f32
    m_ref,  # (BH, 128) f32 (lane-padded running max)
    l_ref,  # (BH, 128) f32 (running denominator)
    sems,  # DMA semaphores (2, 2)
    w_sems,  # write-back semaphores (2,)
):
    li = idx_ref[0]
    pos = idx_ref[1]
    bh, dh = q_ref.shape

    # 1) write the new K/V row into the cache at (li, pos)
    kw = pltpu.make_async_copy(k_new_ref, k_out.at[li, pl.ds(pos, 1)], w_sems.at[0])
    vw = pltpu.make_async_copy(v_new_ref, v_out.at[li, pl.ds(pos, 1)], w_sems.at[1])
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()

    # 2) flash accumulation over the valid prefix [0, pos]
    n_chunks = (pos + chunk) // chunk  # ceil((pos+1)/chunk)
    # chunks entirely below min(starts) are fully masked for EVERY row —
    # skip their DMA+compute outright (bit-exact: masked scores are -1e30
    # and contribute exactly 0). In the continuous-batching engine the
    # retired/joined rows push min(starts) toward pos, and the dead-prefix
    # cache stream dominates long-position decode.
    first = idx_ref[2] // chunk
    scale = 1.0 / np.sqrt(dh)
    q = q_ref[:].astype(jnp.float32) * scale  # (BH, Dh)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    def get_dma(slot, c):
        return (
            pltpu.make_async_copy(
                k_out.at[li, pl.ds(c * chunk, chunk)], k_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_out.at[li, pl.ds(c * chunk, chunk)], v_buf.at[slot], sems.at[slot, 1]
            ),
        )

    dk, dv = get_dma(jax.lax.rem(first, 2), first)
    dk.start()
    dv.start()

    if chunkv2:
        # transpose-free layout: scores stay (C, BH) as DMA'd; stats are
        # (1, BH) loop-carry rows (see _chunkv2_enabled)
        starts_row = starts_ref[:].reshape(1, bh)

        def body2(c, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                nk, nv = get_dma(jax.lax.rem(c + 1, 2), c + 1)
                nk.start()
                nv.start()

            ck, cv = get_dma(slot, c)
            ck.wait()
            cv.wait()
            k = k_buf[slot].astype(jnp.float32)  # (C, BH, Dh)
            v = v_buf[slot].astype(jnp.float32)
            s = jnp.sum(q[None, :, :] * k, axis=-1)  # (C, BH)
            ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, bh), 0) + c * chunk
            s = jnp.where((ids <= pos) & (ids >= starts_row), s, -1e30)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (1, BH)
            p = jnp.exp(s - m_new)  # (C, BH)
            l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
            acc = acc * alpha.reshape(bh, 1) + jnp.sum(p[:, :, None] * v, axis=0)
            return (m_new, l_new, acc)

        _, l_f, acc_f = jax.lax.fori_loop(
            first,
            n_chunks,
            body2,
            (
                jnp.full((1, bh), -1e30, jnp.float32),
                jnp.zeros((1, bh), jnp.float32),
                jnp.zeros((bh, dh), jnp.float32),
            ),
        )
        y_ref[:] = (acc_f / jnp.maximum(l_f.reshape(bh, 1), 1e-30)).astype(y_ref.dtype)
        return

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            nk, nv = get_dma(nxt, c + 1)
            nk.start()
            nv.start()

        ck, cv = get_dma(slot, c)
        ck.wait()
        cv.wait()

        k = k_buf[slot].astype(jnp.float32)  # (C, BH, Dh)
        v = v_buf[slot].astype(jnp.float32)
        # scores: (BH, C) = sum_d q[n,d] * k[c,n,d]
        s = jnp.sum(q[None, :, :] * k, axis=-1).T  # (BH, C)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, chunk), 1) + c * chunk
        # per-row window [start_row, pos]: left-padded ragged batches set
        # start_row to the row's pad length so pad slots are never attended
        s = jnp.where((slot_ids <= pos) & (slot_ids >= starts_ref[:]), s, -1e30)

        m_prev = m_ref[:, :1]  # (BH, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (BH, 1)
        p = jnp.exp(s - m_new)  # (BH, C)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # acc: (BH, Dh) += p @ v  per head: sum_c p[n,c] * v[c,n,d]
        pv = jnp.sum(p.T[:, :, None] * v, axis=0)  # (BH, Dh)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return _

    jax.lax.fori_loop(first, n_chunks, body, None)
    y_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(y_ref.dtype)


def decode_attention(
    q: jax.Array,  # (B, H, Dh)
    k_new: jax.Array,  # (B, H, Dh)
    v_new: jax.Array,  # (B, H, Dh)
    k_cache: jax.Array,  # (L, S, B, H, Dh)
    v_cache: jax.Array,  # (L, S, B, H, Dh)
    layer: jax.Array,  # () int32
    pos: jax.Array,  # () int32
    starts: jax.Array | None = None,  # (B,) int32 per-row window start
    interpret: bool = False,
):
    """One fused decode-attention step for one layer.

    Returns (y (B, H, Dh), k_cache, v_cache) with the caches updated in
    place at (layer, pos). GQA (cache heads H_kv < H, inferred from
    k_new.shape[1]) routes through the multi-token kernel with T=1 — its
    chunk loop runs in kv-head space, so the cache stream shrinks by
    H/H_kv with no per-chunk repeat relayout.
    """
    b, h, dh = q.shape
    if k_new.shape[1] != h:
        y4, k_out, v_out = decode_attention_multi(
            q[:, :, None, :],
            k_new[:, :, None, :],
            v_new[:, :, None, :],
            k_cache,
            v_cache,
            layer,
            pos,
            starts=starts,
            interpret=interpret,
        )
        return y4[:, :, 0, :], k_out, v_out
    l, s, _, _, _ = k_cache.shape
    bh = b * h
    chunk = _chunk_for(bh, dh)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts_bh = jnp.repeat(starts.astype(jnp.int32), h).reshape(bh, 1)
    q2 = q.reshape(bh, dh)
    k2 = k_new.reshape(1, bh, dh)
    v2 = v_new.reshape(1, bh, dh)
    # keep the cache 4-D (L, S, BH, Dh): TPU memref tiling covers only the
    # last two dims, so slicing single S rows stays legal
    k_flat = k_cache.reshape(l, s, bh, dh)
    v_flat = v_cache.reshape(l, s, bh, dh)
    # [layer, pos, min_start]: the kernel skips cache chunks entirely below
    # min(starts) — fully masked for every row, so bit-exact (clamped to pos
    # so the chunk-loop prologue DMA can never run past the valid range)
    idx = jnp.stack([
        layer.astype(jnp.int32),
        pos.astype(jnp.int32),
        jnp.minimum(jnp.min(starts.astype(jnp.int32)), pos.astype(jnp.int32)),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # starts
            # caches must stay in HBM: untiled memrefs allow the single-row
            # DMA writes, and the full cache would blow VMEM anyway
            pl.BlockSpec(memory_space=pltpu.HBM),  # k_hbm
            pl.BlockSpec(memory_space=pltpu.HBM),  # v_hbm
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, bh, dh), k_cache.dtype),
            pltpu.VMEM((2, chunk, bh, dh), v_cache.dtype),
            pltpu.VMEM((bh, dh), jnp.float32),
            pltpu.VMEM((bh, 128), jnp.float32),
            pltpu.VMEM((bh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y, k_out, v_out = pl.pallas_call(
        partial(_decode_attn_kernel, chunk, _chunkv2_enabled()),
        out_shape=(
            jax.ShapeDtypeStruct((bh, dh), q.dtype),
            jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
        ),
        grid_spec=grid_spec,
        # caches update in place (indices include the scalar-prefetch arg 0)
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, q2, k2, v2, starts_bh, k_flat, v_flat)
    return (
        y.reshape(b, h, dh),
        k_out.reshape(l, s, b, h, dh),
        v_out.reshape(l, s, b, h, dh),
    )


def decode_attention_reference(q, k_new, v_new, k_cache, v_cache, layer, pos, starts=None):
    """jnp semantics oracle (and CPU path) for decode_attention.

    GQA-capable: the cache carries ``H_kv = k_new.shape[1]`` heads; when
    H_kv < H the keys/values are broadcast over the ``H // H_kv`` query
    heads of each group (reference fam/llm/fast_model.py:208-221
    repeat_interleave semantics)."""
    b, h, dh = q.shape
    h_kv = k_new.shape[1]
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new[None, None].astype(k_cache.dtype), (layer, pos, 0, 0, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new[None, None].astype(v_cache.dtype), (layer, pos, 0, 0, 0)
    )
    lk = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    lv = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    if h_kv != h:
        lk = jnp.repeat(lk, h // h_kv, axis=2)
        lv = jnp.repeat(lv, h // h_kv, axis=2)
    s = jnp.einsum("bhd,sbhd->bhs", q.astype(jnp.float32), lk.astype(jnp.float32))
    s = s / np.sqrt(dh)
    slot = jnp.arange(lk.shape[0])
    valid = slot[None, None, :] <= pos
    if starts is not None:
        valid = valid & (slot[None, None, :] >= starts[:, None, None])
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum("bhs,sbhd->bhd", p, lv.astype(jnp.float32))
    return y.astype(q.dtype), k_cache, v_cache


# --------------------------------------------------------------------------------------
# Multi-token (T >= 1) decode attention: the speculative-verify kernel
# --------------------------------------------------------------------------------------
#
# Speculative decoding verifies gamma drafted tokens with ONE target forward
# (models/spec_decode.py). Round 4 routed that T=gamma attention through the
# XLA prefill path, which streams the FULL static (S, B, H, Dh) cache per
# layer — most of the measured 2.75x per-round overhead. This kernel is the
# flash-decode kernel generalized to T queries at positions [pos, pos+T):
#
#   * the T new K/V rows are written into the HBM cache in one DMA,
#   * the chunk loop streams only [min(starts), pos+T) — length-bounded,
#     exactly like the T=1 kernels,
#   * each query t masks slots <= pos + t (causal within the window),
#   * the T (and, under GQA, the g = H/H_kv per-kv-head query) score blocks
#     are a STATIC Python loop inside the chunk body, so the cache chunk is
#     DMA'd once and reused T*g times — the whole point of speculation.
#
# GQA layout choice: K/V chunks stay in KV-HEAD space ((C, B*H_kv, Dh) as
# DMA'd) and the g query heads of each group are separate (B*H_kv, Dh) score
# rounds — NOT a jnp.repeat of K/V to query-head count, which would be a
# per-chunk O(C*B*H*Dh) VPU relayout (the exact cost class that made the
# int8 KV cache a wash; see CLAUDE.md). VPU work is identical to MHA at the
# same total query count; the cache read shrinks by H/H_kv.


def _decode_attn_multi_kernel(
    chunk: int,
    t_q: int,
    g: int,
    # scalar prefetch
    idx_ref,  # (3,) int32: [layer, pos, min_start]
    # inputs
    q_ref,  # (T*g, BKV, Dh) VMEM — row j = t*g + i, col r = b*H_kv + hkv
    k_new_ref,  # (T, BKV, Dh) VMEM
    v_new_ref,  # (T, BKV, Dh) VMEM
    starts_ref,  # (BKV, 1) int32 VMEM: per-row first valid cache slot
    k_hbm,  # (L, S, BKV, Dh) HBM (aliased output)
    v_hbm,
    # outputs
    y_ref,  # (T*g, BKV, Dh) VMEM
    k_out,
    v_out,
    # scratch
    k_buf,  # (2, CHUNK, BKV, Dh)
    v_buf,
    sems,  # DMA (2, 2)
    w_sems,  # DMA (2,)
):
    li = idx_ref[0]
    pos = idx_ref[1]
    bkv, dh = q_ref.shape[1], q_ref.shape[2]

    # 1) write the T new K/V rows into the cache at [pos, pos+T)
    kw = pltpu.make_async_copy(k_new_ref, k_out.at[li, pl.ds(pos, t_q)], w_sems.at[0])
    vw = pltpu.make_async_copy(v_new_ref, v_out.at[li, pl.ds(pos, t_q)], w_sems.at[1])
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()

    # 2) flash accumulation over [min(starts), pos + T)
    n_chunks = (pos + t_q - 1) // chunk + 1
    first = idx_ref[2] // chunk
    scale = 1.0 / np.sqrt(dh)

    def get_dma(slot, c):
        return (
            pltpu.make_async_copy(
                k_out.at[li, pl.ds(c * chunk, chunk)], k_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_out.at[li, pl.ds(c * chunk, chunk)], v_buf.at[slot], sems.at[slot, 1]
            ),
        )

    dk, dv = get_dma(jax.lax.rem(first, 2), first)
    dk.start()
    dv.start()

    starts_row = starts_ref[:].reshape(1, bkv)

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            nk, nv = get_dma(jax.lax.rem(c + 1, 2), c + 1)
            nk.start()
            nv.start()

        ck, cv = get_dma(slot, c)
        ck.wait()
        cv.wait()
        k = k_buf[slot].astype(jnp.float32)  # (C, BKV, Dh)
        v = v_buf[slot].astype(jnp.float32)
        ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, bkv), 0) + c * chunk
        base_valid = ids >= starts_row  # (C, BKV)
        out = []
        for t in range(t_q):
            bound = pos + t
            valid_t = base_valid & (ids <= bound)
            for i in range(g):
                j = t * g + i
                m_prev, l_prev, acc = carry[j]
                q_j = q_ref[j].astype(jnp.float32) * scale  # (BKV, Dh)
                s = jnp.sum(q_j[None, :, :] * k, axis=-1)  # (C, BKV)
                s = jnp.where(valid_t, s, -1e30)
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)  # (1, BKV)
                p = jnp.exp(s - m_new)  # (C, BKV)
                l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
                acc = acc * alpha.reshape(bkv, 1) + jnp.sum(p[:, :, None] * v, axis=0)
                out.append((m_new, l_new, acc))
        return tuple(out)

    init = tuple(
        (
            jnp.full((1, bkv), -1e30, jnp.float32),
            jnp.zeros((1, bkv), jnp.float32),
            jnp.zeros((bkv, dh), jnp.float32),
        )
        for _ in range(t_q * g)
    )
    final = jax.lax.fori_loop(first, n_chunks, body, init)
    for j in range(t_q * g):
        _, l_f, acc_f = final[j]
        y_ref[j] = (acc_f / jnp.maximum(l_f.reshape(bkv, 1), 1e-30)).astype(
            y_ref.dtype
        )


def decode_attention_multi(
    q: jax.Array,  # (B, H, T, Dh)
    k_new: jax.Array,  # (B, H_kv, T, Dh)
    v_new: jax.Array,  # (B, H_kv, T, Dh)
    k_cache: jax.Array,  # (L, S, B, H_kv, Dh)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    pos: jax.Array,  # () int32 — first new position
    starts: jax.Array | None = None,  # (B,) int32 per-row window start
    interpret: bool = False,
):
    """T-query fused decode attention for one layer (GQA-capable).

    Writes the T new K/V rows at cache positions [pos, pos+T) and returns
    (y (B, H, T, Dh), k_cache, v_cache) where query t attends cache slots
    [starts[b], pos + t]. T == 1, H_kv == H reduces to decode_attention
    semantics. Requires pos + T <= S and Dh % 128 == 0.
    """
    b, h, t_q, dh = q.shape
    h_kv = k_new.shape[1]
    assert h % h_kv == 0, (h, h_kv)
    g = h // h_kv
    l, s = k_cache.shape[0], k_cache.shape[1]
    bkv = b * h_kv
    chunk = _chunk_for(bkv, dh)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts_bkv = jnp.repeat(starts.astype(jnp.int32), h_kv).reshape(bkv, 1)
    # query rows ordered j = t*g + i, columns r = b*H_kv + hkv, where the
    # model's head h = hkv*g + i (grouped-heads split, matching jnp.repeat
    # of KV heads in the oracle)
    q2 = (
        q.reshape(b, h_kv, g, t_q, dh)
        .transpose(3, 2, 0, 1, 4)
        .reshape(t_q * g, bkv, dh)
    )
    k2 = k_new.transpose(2, 0, 1, 3).reshape(t_q, bkv, dh)
    v2 = v_new.transpose(2, 0, 1, 3).reshape(t_q, bkv, dh)
    k_flat = k_cache.reshape(l, s, bkv, dh)
    v_flat = v_cache.reshape(l, s, bkv, dh)
    idx = jnp.stack([
        layer.astype(jnp.int32),
        pos.astype(jnp.int32),
        jnp.minimum(jnp.min(starts.astype(jnp.int32)), pos.astype(jnp.int32)),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.HBM),  # k cache
            pl.BlockSpec(memory_space=pltpu.HBM),  # v cache
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, bkv, dh), k_cache.dtype),
            pltpu.VMEM((2, chunk, bkv, dh), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y, k_out, v_out = pl.pallas_call(
        partial(_decode_attn_multi_kernel, chunk, t_q, g),
        out_shape=(
            jax.ShapeDtypeStruct((t_q * g, bkv, dh), q.dtype),
            jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={5: 1, 6: 2},
        # T*g live accumulators + the double-buffered chunks exceed the
        # default 16 MB scoped-vmem limit at full-model shapes
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, q2, k2, v2, starts_bkv, k_flat, v_flat)
    y4 = (
        y.reshape(t_q, g, b, h_kv, dh)
        .transpose(2, 3, 1, 0, 4)
        .reshape(b, h, t_q, dh)
    )
    return (
        y4,
        k_out.reshape(k_cache.shape),
        v_out.reshape(v_cache.shape),
    )


def decode_attention_multi_reference(
    q, k_new, v_new, k_cache, v_cache, layer, pos, starts=None
):
    """jnp semantics oracle (and CPU path) for decode_attention_multi."""
    b, h, t_q, dh = q.shape
    h_kv = k_new.shape[1]
    k_cache = jax.lax.dynamic_update_slice(
        k_cache,
        k_new.transpose(2, 0, 1, 3)[None].astype(k_cache.dtype),
        (layer, pos, 0, 0, 0),
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache,
        v_new.transpose(2, 0, 1, 3)[None].astype(v_cache.dtype),
        (layer, pos, 0, 0, 0),
    )
    lk = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    lv = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    if h_kv != h:
        lk = jnp.repeat(lk, h // h_kv, axis=2)
        lv = jnp.repeat(lv, h // h_kv, axis=2)
    s = jnp.einsum(
        "bhtd,sbhd->bhts", q.astype(jnp.float32), lk.astype(jnp.float32)
    ) / np.sqrt(dh)
    slot = jnp.arange(lk.shape[0])
    bounds = pos + jnp.arange(t_q)
    valid = slot[None, None, None, :] <= bounds[None, None, :, None]
    if starts is not None:
        valid = valid & (slot[None, None, None, :] >= starts[:, None, None, None])
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum("bhts,sbhd->bhtd", p, lv.astype(jnp.float32))
    return y.astype(q.dtype), k_cache, v_cache


# --------------------------------------------------------------------------------------
# Fused decode block: int8 QKV projection + cache write + flash attention
# + int8 output projection, one kernel per layer
# --------------------------------------------------------------------------------------
#
# After the flash-decoding kernel the decode step still spends ~40% of its
# time in per-op overhead around the attention path (QKV matmul kernel,
# slicing/reshaping, the attention kernel, the wo matmul kernel, plus XLA
# glue). This kernel collapses the whole attention block into ONE Pallas
# call: weight tiles stream HBM->VMEM with double buffering, the Q/K/V
# activations never leave VMEM, the new K/V row is written into the HBM
# cache in place, and the flash loop reads only the valid prefix.

W_TILE = 512  # weight tile width (1024 measured slightly slower)


def _decode_block_kernel(
    dh: int,
    chunk: int,
    chunkv2: bool,
    # scalar prefetch
    idx_ref,  # (3,) int32: [layer, pos, min_start]
    # inputs
    x_ref,  # (Bpad, D) bf16 VMEM (normed input, rows >= B zero-padded)
    sqkv_ref,  # (1, 3D) f32 VMEM qkv scales
    so_ref,  # (1, D) f32 VMEM wo scales
    starts_ref,  # (BH, 1) int32 VMEM
    wqkv_hbm,  # (D, 3D) int8 HBM
    wo_hbm,  # (D, D) int8 HBM
    k_hbm,  # (L, S, BH, Dh) HBM (aliased out)
    v_hbm,  # (L, S, BH, Dh) HBM (aliased out)
    # outputs
    y_ref,  # (Bpad, D) bf16 VMEM
    k_out,
    v_out,
    # scratch
    w_buf,  # (2, D, W_TILE) int8
    qkv_scr,  # (Bpad, 3D) f32
    k_buf,  # (2, CHUNK, BH, Dh)
    v_buf,  # (2, CHUNK, BH, Dh)
    acc_ref,  # (BH, Dh) f32
    m_ref,  # (BH, 128) f32
    l_ref,  # (BH, 128) f32
    w_sems,  # DMA (2,)
    kv_w_sems,  # DMA (2,)
    c_sems,  # DMA (2, 2)
):
    li = idx_ref[0]
    pos = idx_ref[1]
    bpad, d = x_ref.shape
    bh = acc_ref.shape[0]
    b = bh * dh // d
    x = x_ref[:]

    # ---- phase 1: qkv = x @ Wqkv (int8), streaming weight tiles ----------------
    n_qkv_tiles = (3 * d) // W_TILE

    def qkv_dma(slot, j):
        return pltpu.make_async_copy(
            wqkv_hbm.at[:, pl.ds(j * W_TILE, W_TILE)], w_buf.at[slot], w_sems.at[slot]
        )

    qkv_dma(0, 0).start()

    def qkv_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_qkv_tiles)
        def _():
            qkv_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        qkv_dma(slot, j).wait()
        w = w_buf[slot].astype(jnp.bfloat16)
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        qkv_scr[:, pl.ds(j * W_TILE, W_TILE)] = acc * sqkv_ref[0, pl.ds(j * W_TILE, W_TILE)]
        return _

    jax.lax.fori_loop(0, n_qkv_tiles, qkv_body, None)

    # ---- phase 2: write new K/V row into the cache ----------------------------
    # qkv_scr rows [0, b) are real; layout (b, 3D) -> (BH, Dh) per tensor.
    # DMA sources must be VMEM refs of the cache dtype: stage the new row in
    # the (otherwise unused yet) chunk buffers.
    q = qkv_scr[:b, :d].reshape(bh, dh) * (1.0 / np.sqrt(dh))
    k_buf[0, 0] = qkv_scr[:b, d : 2 * d].reshape(bh, dh).astype(k_out.dtype)
    v_buf[0, 0] = qkv_scr[:b, 2 * d :].reshape(bh, dh).astype(v_out.dtype)
    kw = pltpu.make_async_copy(k_buf.at[0, pl.ds(0, 1)], k_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[0])
    vw = pltpu.make_async_copy(v_buf.at[0, pl.ds(0, 1)], v_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[1])
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()

    # ---- phase 3: flash attention over the valid prefix -----------------------
    n_chunks = (pos + chunk) // chunk
    first = idx_ref[2] // chunk  # skip fully-masked chunks below min(starts)

    def get_dma(slot, c):
        return (
            pltpu.make_async_copy(
                k_out.at[li, pl.ds(c * chunk, chunk)], k_buf.at[slot], c_sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_out.at[li, pl.ds(c * chunk, chunk)], v_buf.at[slot], c_sems.at[slot, 1]
            ),
        )

    dk, dv = get_dma(jax.lax.rem(first, 2), first)
    dk.start()
    dv.start()

    if chunkv2:
        # transpose-free chunk loop (see ops/decode_stack.py chunkv2 note):
        # scores stay (C, BH) as DMA'd; softmax stats ride the loop carry as
        # (1, BH) rows — kills the two O(C*BH) relayouts per chunk
        starts_row = starts_ref[:].reshape(1, bh)

        def attn_body2(c, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                nk, nv = get_dma(jax.lax.rem(c + 1, 2), c + 1)
                nk.start()
                nv.start()

            ck, cv = get_dma(slot, c)
            ck.wait()
            cv.wait()
            k = k_buf[slot].astype(jnp.float32)
            v = v_buf[slot].astype(jnp.float32)
            s = jnp.sum(q[None, :, :] * k, axis=-1)  # (C, BH)
            ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, bh), 0) + c * chunk
            s = jnp.where((ids <= pos) & (ids >= starts_row), s, -1e30)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (1, BH)
            p = jnp.exp(s - m_new)  # (C, BH)
            l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
            acc = acc * alpha.reshape(bh, 1) + jnp.sum(p[:, :, None] * v, axis=0)
            return (m_new, l_new, acc)

        _, l_f, acc_f = jax.lax.fori_loop(
            first,
            n_chunks,
            attn_body2,
            (
                jnp.full((1, bh), -1e30, jnp.float32),
                jnp.zeros((1, bh), jnp.float32),
                jnp.zeros((bh, dh), jnp.float32),
            ),
        )
        y_attn = (
            acc_f / jnp.maximum(l_f.reshape(bh, 1), 1e-30)
        ).reshape(b, d).astype(jnp.bfloat16)
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

        def attn_body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                nk, nv = get_dma(jax.lax.rem(c + 1, 2), c + 1)
                nk.start()
                nv.start()

            ck, cv = get_dma(slot, c)
            ck.wait()
            cv.wait()
            k = k_buf[slot].astype(jnp.float32)
            v = v_buf[slot].astype(jnp.float32)
            s = jnp.sum(q[None, :, :] * k, axis=-1).T  # (BH, C)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, chunk), 1) + c * chunk
            s = jnp.where((slot_ids <= pos) & (slot_ids >= starts_ref[:]), s, -1e30)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = jnp.broadcast_to(l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
            acc_ref[:] = acc_ref[:] * alpha + jnp.sum(p.T[:, :, None] * v, axis=0)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            return _

        jax.lax.fori_loop(first, n_chunks, attn_body, None)
        y_attn = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).reshape(b, d).astype(jnp.bfloat16)
    # pad rows back to Bpad for the MXU (concatenate: scatter doesn't lower)
    if bpad > b:
        y_pad = jnp.concatenate([y_attn, jnp.zeros((bpad - b, d), jnp.bfloat16)], axis=0)
    else:
        y_pad = y_attn

    # ---- phase 4: y = attn @ Wo (int8), streaming weight tiles -----------------
    n_o_tiles = d // W_TILE

    def o_dma(slot, j):
        return pltpu.make_async_copy(
            wo_hbm.at[:, pl.ds(j * W_TILE, W_TILE)], w_buf.at[slot], w_sems.at[slot]
        )

    o_dma(0, 0).start()

    def o_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_o_tiles)
        def _():
            o_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        o_dma(slot, j).wait()
        w = w_buf[slot].astype(jnp.bfloat16)
        acc = jnp.dot(y_pad, w, preferred_element_type=jnp.float32)
        y_ref[:, pl.ds(j * W_TILE, W_TILE)] = (
            acc * so_ref[0, pl.ds(j * W_TILE, W_TILE)]
        ).astype(y_ref.dtype)
        return _

    jax.lax.fori_loop(0, n_o_tiles, o_body, None)


W4_TILE = 1024  # int4 weight tile width (i32 words; measured best vs 512/2048)


def _decode_block_int4_kernel(
    dh: int,
    chunk: int,
    groupsize: int,
    g: int,  # query heads per kv head (GQA group size; 1 = MHA)
    cache_int8: bool,
    cache_packed: bool,
    kv8_mode: str,
    chunkv2: bool,
    # scalar prefetch
    idx_ref,  # (3,) int32: [layer, pos, min_start]
    # inputs
    x_ref,  # (Bpad, D) bf16 VMEM (normed input, rows >= B zero-padded)
    xones_ref,  # (D, Gp) bf16 VMEM group-sum matrix
    starts_ref,  # (BH, 1) int32 VMEM
    wqkv_hbm,  # (L, D/8, 3D) i32 packed
    sqkv_hbm,  # (L, 2*Gp, 3D) bf16
    wo_hbm,  # (L, D/8, D) i32 packed
    so_hbm,  # (L, 2*Gp, D) bf16
    k_hbm,  # (L, S, BH, Dh) HBM (aliased out)
    v_hbm,
    *rest,
):
    """int4 variant of _decode_block_kernel: same four phases, with the
    qkv/wo projections reading 4-bit packed weights (see ops/quantized.py
    int4-in-int32 notes for the layout and dequant identity).

    ``cache_int8``: the KV cache is int8 with per-(position, head) absmax
    scales in separate (L, S, 1, BH) f32 arrays — the new row is quantized
    in-kernel and the flash loop dequantizes each streamed chunk by folding
    the scales into the score/probability matrices (halves the cache HBM
    read that dominates long-context decode). The tables are sequence-major
    like the cache itself, so the chunk DMAs slice the S axis at arbitrary
    offsets (any batch size / chunk length) and the new row's scale is a
    direct width-1 S-slice write; DMAs index the singleton axis away so the
    VMEM buffers are plain (chunk, BH) / (1, BH).
    """
    from metavoice_tpu.ops.quantized import _int4_group_matmul

    krm_buf = vrm_buf = rmw_sems = None
    if cache_packed:
        (ks_hbm, vs_hbm, y_ref, k_out, v_out, ks_out, vs_out,
         w_buf, sc_buf, qkv_scr, k_buf, v_buf, ks_buf, vs_buf,
         ks_stage, vs_stage, krm_buf, vrm_buf,
         acc_ref, m_ref, l_ref, w_sems, kv_w_sems, c_sems, s_sems,
         rmw_sems) = rest
    elif cache_int8:
        (ks_hbm, vs_hbm, y_ref, k_out, v_out, ks_out, vs_out,
         w_buf, sc_buf, qkv_scr, k_buf, v_buf, ks_buf, vs_buf,
         ks_stage, vs_stage,
         acc_ref, m_ref, l_ref, w_sems, kv_w_sems, c_sems, s_sems) = rest
    else:
        (y_ref, k_out, v_out,
         w_buf, sc_buf, qkv_scr, k_buf, v_buf,
         acc_ref, m_ref, l_ref, w_sems, kv_w_sems, c_sems) = rest
        ks_out = vs_out = ks_buf = vs_buf = ks_stage = vs_stage = s_sems = None

    li = idx_ref[0]
    pos = idx_ref[1]
    if cache_packed:
        # start the read half of the new-row word RMW immediately — it only
        # depends on (layer, pos) and its latency hides under phase 1
        pos_w = pos // 4
        krm_read = pltpu.make_async_copy(
            k_out.at[li, pl.ds(pos_w, 1)], krm_buf, rmw_sems.at[0]
        )
        vrm_read = pltpu.make_async_copy(
            v_out.at[li, pl.ds(pos_w, 1)], vrm_buf, rmw_sems.at[1]
        )
        krm_read.start()
        vrm_read.start()
    bpad, d = x_ref.shape
    bh = acc_ref.shape[0]  # query rows b * n_head
    bkv = bh // g  # cache rows b * n_kv_head
    b = bh * dh // d
    tile = w_buf.shape[2]
    x = x_ref[:]
    xsum = jnp.dot(x, xones_ref[:], preferred_element_type=jnp.float32)

    # ---- phase 1: qkv = x @ Wqkv (int4), streaming packed weight tiles ------
    n_qkv_tiles = qkv_scr.shape[1] // tile  # (H + 2*H_kv) * Dh columns

    def qkv_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(wqkv_hbm.at[li, :, sl], w_buf.at[slot], w_sems.at[slot, 0]),
            pltpu.make_async_copy(sqkv_hbm.at[li, :, sl], sc_buf.at[slot], w_sems.at[slot, 1]),
        )

    for dma in qkv_dma(0, 0):
        dma.start()

    def qkv_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_qkv_tiles)
        def _():
            for dma in qkv_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in qkv_dma(slot, j):
            dma.wait()
        acc = _int4_group_matmul(x, xsum, w_buf[slot], sc_buf[slot], groupsize)
        qkv_scr[:, pl.ds(j * tile, tile)] = acc
        return _

    jax.lax.fori_loop(0, n_qkv_tiles, qkv_body, None)

    # ---- phase 2: write new K/V row into the cache --------------------------
    dkv = (bkv // b) * dh  # K (= V) projection width per batch row
    q = qkv_scr[:b, :d].reshape(bh, dh) * (1.0 / np.sqrt(dh))
    q_bf16 = (
        q.astype(jnp.bfloat16)
        if (cache_packed or (cache_int8 and kv8_mode == "bf16"))
        else None
    )
    k_row = qkv_scr[:b, d : d + dkv].reshape(bkv, dh)
    v_row = qkv_scr[:b, d + dkv : d + 2 * dkv].reshape(bkv, dh)

    def _stage_scales(k_s, v_s):
        # zero-pad the (bkv, 1) scale rows out to the tables' 128-aligned
        # lane width and stage them as (1, bh_pad) rows for the DMA
        bh_pad = ks_stage.shape[-1]
        if bh_pad > bkv:
            pad = jnp.zeros((bh_pad - bkv, 1), jnp.float32)
            k_s = jnp.concatenate([k_s, pad], axis=0)
            v_s = jnp.concatenate([v_s, pad], axis=0)
        ks_stage[:] = k_s.reshape(1, bh_pad)
        vs_stage[:] = v_s.reshape(1, bh_pad)

    def _quant_i32(row):
        # per-(row, head) absmax int8 quantization, result held in i32
        # (Mosaic: narrow to i8 only at the store; the packed path keeps
        # i32 for the byte merge). MUST match quantize_kv_rows at the XLA
        # level bit-exactly — join/prefill parity tests depend on it.
        a = jnp.max(jnp.abs(row), axis=-1, keepdims=True)
        s = jnp.maximum(a, 1e-8) * (1.0 / 127.0)
        q8 = jnp.clip(jnp.round(row / s), -127, 127).astype(jnp.int32)
        return q8, s

    if cache_packed:
        # quantize the new row and merge its byte into the packed word row
        # read at kernel start (read-modify-write; other bytes preserved)
        k_qi, k_s = _quant_i32(k_row)
        v_qi, v_s = _quant_i32(v_row)
        posj = jax.lax.rem(pos, 4)
        sh = 8 * posj
        byte_mask = jnp.bitwise_xor(jnp.left_shift(jnp.int32(0xFF), sh), jnp.int32(-1))
        krm_read.wait()
        vrm_read.wait()
        krm_buf[0] = (krm_buf[0] & byte_mask) | ((k_qi & 0xFF) << sh)
        vrm_buf[0] = (vrm_buf[0] & byte_mask) | ((v_qi & 0xFF) << sh)
        kw = pltpu.make_async_copy(krm_buf, k_out.at[li, pl.ds(pos_w, 1)], kv_w_sems.at[0])
        vw = pltpu.make_async_copy(vrm_buf, v_out.at[li, pl.ds(pos_w, 1)], kv_w_sems.at[1])
        kw.start()
        vw.start()
        _stage_scales(k_s, v_s)
        # residue-split tables (L, 4, S/4, 1, BHpad): the new scale goes to
        # residue row pos%4, word column pos//4
        ksw = pltpu.make_async_copy(ks_stage, ks_out.at[li, posj, pl.ds(pos_w, 1), 0], s_sems.at[0])
        vsw = pltpu.make_async_copy(vs_stage, vs_out.at[li, posj, pl.ds(pos_w, 1), 0], s_sems.at[1])
        ksw.start()
        vsw.start()
        ksw.wait()
        vsw.wait()
        kw.wait()
        vw.wait()
    else:
        if cache_int8:
            k_qi, k_s = _quant_i32(k_row)
            v_qi, v_s = _quant_i32(v_row)
            k_q = k_qi.astype(jnp.int8)
            v_q = v_qi.astype(jnp.int8)
            k_buf[0, 0] = k_q
            v_buf[0, 0] = v_q
            # direct width-1 S-slice write of the new row's scales (the
            # sequence-major tables make `pos` a legal slice offset)
            _stage_scales(k_s, v_s)
            ksw = pltpu.make_async_copy(ks_stage, ks_out.at[li, pl.ds(pos, 1), 0], s_sems.at[0])
            vsw = pltpu.make_async_copy(vs_stage, vs_out.at[li, pl.ds(pos, 1), 0], s_sems.at[1])
            ksw.start()
            vsw.start()
        else:
            k_buf[0, 0] = k_row.astype(k_out.dtype)
            v_buf[0, 0] = v_row.astype(v_out.dtype)
        kw = pltpu.make_async_copy(k_buf.at[0, pl.ds(0, 1)], k_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[0])
        vw = pltpu.make_async_copy(v_buf.at[0, pl.ds(0, 1)], v_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[1])
        kw.start()
        vw.start()
        if cache_int8:
            ksw.wait()
            vsw.wait()
        kw.wait()
        vw.wait()

    # ---- phase 3: flash attention over the valid prefix ---------------------
    n_chunks = (pos + chunk) // chunk
    first = idx_ref[2] // chunk  # skip fully-masked chunks below min(starts)

    def get_dma(slot, c):
        if cache_packed:
            # word-packed cache: a chunk of `chunk` positions is chunk/4
            # int32 words; the residue-split scale tables deliver the
            # matching (4, chunk/4, BHpad) block in ONE strided DMA
            c4 = chunk // 4
            return [
                pltpu.make_async_copy(
                    k_out.at[li, pl.ds(c * c4, c4)], k_buf.at[slot], c_sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    v_out.at[li, pl.ds(c * c4, c4)], v_buf.at[slot], c_sems.at[slot, 1]
                ),
                pltpu.make_async_copy(
                    ks_out.at[li, :, pl.ds(c * c4, c4), 0], ks_buf.at[slot], c_sems.at[slot, 2]
                ),
                pltpu.make_async_copy(
                    vs_out.at[li, :, pl.ds(c * c4, c4), 0], vs_buf.at[slot], c_sems.at[slot, 3]
                ),
            ]
        copies = [
            pltpu.make_async_copy(
                k_out.at[li, pl.ds(c * chunk, chunk)], k_buf.at[slot], c_sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_out.at[li, pl.ds(c * chunk, chunk)], v_buf.at[slot], c_sems.at[slot, 1]
            ),
        ]
        if cache_int8:
            # sequence-major scales (L, S, 1, BH): chunk slices the S axis
            # (third-from-last — legal at any offset), singleton indexed away
            copies.append(pltpu.make_async_copy(
                ks_out.at[li, pl.ds(c * chunk, chunk), 0], ks_buf.at[slot], c_sems.at[slot, 2]
            ))
            copies.append(pltpu.make_async_copy(
                vs_out.at[li, pl.ds(c * chunk, chunk), 0], vs_buf.at[slot], c_sems.at[slot, 3]
            ))
        return copies

    for dma in get_dma(jax.lax.rem(first, 2), first):
        dma.start()

    def _load_kv(slot):
        if cache_int8 and kv8_mode == "i32":
            # widen through i32 first (Mosaic lowers narrow-int -> float
            # conversions poorly; see CLAUDE.md i8 relayout notes)
            k = k_buf[slot].astype(jnp.int32).astype(jnp.float32)
            v = v_buf[slot].astype(jnp.int32).astype(jnp.float32)
        elif cache_int8 and kv8_mode == "bf16":
            k = k_buf[slot].astype(jnp.int32).astype(jnp.bfloat16)
            v = v_buf[slot].astype(jnp.int32).astype(jnp.bfloat16)
        else:
            k = k_buf[slot].astype(jnp.float32)
            v = v_buf[slot].astype(jnp.float32)
        return k, v

    def _scores(slot, k):
        if k.dtype == jnp.bfloat16:
            s_pre = jnp.sum(
                q_bf16[None, :, :] * k, axis=-1, dtype=jnp.float32
            )  # (C, BH)
        else:
            s_pre = jnp.sum(q[None, :, :] * k, axis=-1)  # (C, BH)
        if cache_int8:
            # fold K dequant into the scores: scores scale linearly in k
            ks = ks_buf[slot]
            s_pre = s_pre * (ks[:, :bh] if ks.shape[-1] > bh else ks)
        return s_pre

    if g > 1:
        # GQA chunk loops (all three cache formats): K/V chunks stay in
        # KV-HEAD space ((C, BKV, ...) as DMA'd) and the g query heads of
        # each group run as a STATIC loop of (C, BKV) score blocks sharing
        # the chunk — identical VPU work to MHA at the same query count,
        # 1/g the cache DMA bytes, no repeat relayout (the relayout cost
        # class that made the int8 KV cache a wash; CLAUDE.md).
        starts_row = starts_ref[:].reshape(1, bkv)
        q_g = qkv_scr[:b, :d].reshape(bkv, g, dh) * (1.0 / np.sqrt(dh))

        if cache_packed:
            c4 = chunk // 4

            def body_g(c, carry):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    for dma in get_dma(jax.lax.rem(c + 1, 2), c + 1):
                        dma.start()

                for dma in get_dma(slot, c):
                    dma.wait()
                kw_ = k_buf[slot]  # (C4, BKV, Dh) i32 words
                vw_ = v_buf[slot]
                ks4 = ks_buf[slot]  # (4, C4, BHpad) f32
                vs4 = vs_buf[slot]
                base_ids = (
                    jax.lax.broadcasted_iota(jnp.int32, (c4, bkv), 0) * 4
                    + c * chunk
                )
                # unpack the four byte lanes ONCE, shared across the g heads
                kjs = [
                    ((kw_ << (24 - 8 * j)) >> 24).astype(jnp.bfloat16)
                    for j in range(4)
                ]
                vjs = [
                    ((vw_ << (24 - 8 * j)) >> 24).astype(jnp.bfloat16)
                    for j in range(4)
                ]
                valids = [
                    ((base_ids + j) <= pos) & ((base_ids + j) >= starts_row)
                    for j in range(4)
                ]
                out = []
                for i in range(g):
                    m_prev, l_prev, acc = carry[i]
                    q_i = q_g[:, i, :].astype(jnp.bfloat16)
                    s_js = []
                    m_new = m_prev
                    for j in range(4):
                        sj = jnp.sum(
                            q_i[None, :, :] * kjs[j], axis=-1, dtype=jnp.float32
                        )  # (C4, BKV)
                        ksj = ks4[j]
                        sj = sj * (ksj[:, :bkv] if ksj.shape[-1] > bkv else ksj)
                        sj = jnp.where(valids[j], sj, -1e30)
                        s_js.append(sj)
                        m_new = jnp.maximum(
                            m_new, jnp.max(sj, axis=0, keepdims=True)
                        )
                    alpha = jnp.exp(m_prev - m_new)
                    l_add = jnp.zeros((1, bkv), jnp.float32)
                    pv = jnp.zeros((bkv, dh), jnp.float32)
                    for j in range(4):
                        pj = jnp.exp(s_js[j] - m_new)
                        l_add = l_add + jnp.sum(pj, axis=0, keepdims=True)
                        vsj = vs4[j]
                        pj = pj * (vsj[:, :bkv] if vsj.shape[-1] > bkv else vsj)
                        pv = pv + jnp.sum(
                            pj[:, :, None].astype(jnp.bfloat16) * vjs[j],
                            axis=0,
                            dtype=jnp.float32,
                        )
                    out.append(
                        (
                            m_new,
                            l_prev * alpha + l_add,
                            acc * alpha.reshape(bkv, 1) + pv,
                        )
                    )
                return tuple(out)
        else:

            def body_g(c, carry):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    for dma in get_dma(jax.lax.rem(c + 1, 2), c + 1):
                        dma.start()

                for dma in get_dma(slot, c):
                    dma.wait()
                k, v = _load_kv(slot)  # (C, BKV, Dh)
                ids = (
                    jax.lax.broadcasted_iota(jnp.int32, (chunk, bkv), 0)
                    + c * chunk
                )
                valid = (ids <= pos) & (ids >= starts_row)
                if cache_int8:
                    ks = ks_buf[slot]
                    ks = ks[:, :bkv] if ks.shape[-1] > bkv else ks
                    vs = vs_buf[slot]
                    vs = vs[:, :bkv] if vs.shape[-1] > bkv else vs
                out = []
                for i in range(g):
                    m_prev, l_prev, acc = carry[i]
                    if k.dtype == jnp.bfloat16:
                        s = jnp.sum(
                            q_g[:, i, :].astype(jnp.bfloat16)[None, :, :] * k,
                            axis=-1,
                            dtype=jnp.float32,
                        )
                    else:
                        s = jnp.sum(q_g[:, i, :][None, :, :] * k, axis=-1)
                    if cache_int8:
                        s = s * ks
                    s = jnp.where(valid, s, -1e30)
                    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
                    if cache_int8:
                        p = p * vs
                    if v.dtype == jnp.bfloat16:
                        pv = jnp.sum(
                            p[:, :, None].astype(jnp.bfloat16) * v,
                            axis=0,
                            dtype=jnp.float32,
                        )
                    else:
                        pv = jnp.sum(p[:, :, None] * v, axis=0)
                    out.append((m_new, l_new, acc * alpha.reshape(bkv, 1) + pv))
                return tuple(out)

        init = tuple(
            (
                jnp.full((1, bkv), -1e30, jnp.float32),
                jnp.zeros((1, bkv), jnp.float32),
                jnp.zeros((bkv, dh), jnp.float32),
            )
            for _ in range(g)
        )
        final = jax.lax.fori_loop(first, n_chunks, body_g, init)
        ys = [
            acc_f / jnp.maximum(l_f.reshape(bkv, 1), 1e-30)
            for (_, l_f, acc_f) in final
        ]
        # interleave back to query-head order: rows (b, h_kv, i) -> b*H + h
        y_attn = (
            jnp.stack(ys, axis=1).reshape(bh, dh).reshape(b, d).astype(jnp.bfloat16)
        )
    elif cache_packed:
        # packed-cache chunk loop: the chunk arrives as (C/4, BH, Dh) int32
        # words; each byte lane j is unpacked with an arithmetic shift pair
        # (native i32 VPU ops — no i8 relayout) into the positions
        # {4s'+j} of the chunk. Scores/softmax/PV are order-invariant over
        # chunk positions, so the four byte-lane streams are processed as
        # four independent (C/4, BH) score blocks that share one running
        # (1, BH) max/sum — nothing is ever reordered or concatenated.
        c4 = chunk // 4
        starts_row = starts_ref[:].reshape(1, bh)

        def attn_body_p(c, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in get_dma(slot, c):
                dma.wait()
            kw_ = k_buf[slot]  # (C4, BH, Dh) i32 words
            vw_ = v_buf[slot]
            ks4 = ks_buf[slot]  # (4, C4, BHpad) f32
            vs4 = vs_buf[slot]
            base_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (c4, bh), 0) * 4 + c * chunk
            )
            s_js = []
            m_new = m_prev
            for j in range(4):
                kj = ((kw_ << (24 - 8 * j)) >> 24).astype(jnp.bfloat16)
                sj = jnp.sum(
                    q_bf16[None, :, :] * kj, axis=-1, dtype=jnp.float32
                )  # (C4, BH)
                ksj = ks4[j]
                sj = sj * (ksj[:, :bh] if ksj.shape[-1] > bh else ksj)
                ids = base_ids + j
                sj = jnp.where((ids <= pos) & (ids >= starts_row), sj, -1e30)
                s_js.append(sj)
                m_new = jnp.maximum(m_new, jnp.max(sj, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (1, BH)
            l_add = jnp.zeros((1, bh), jnp.float32)
            pv = jnp.zeros((bh, dh), jnp.float32)
            for j in range(4):
                pj = jnp.exp(s_js[j] - m_new)  # (C4, BH)
                l_add = l_add + jnp.sum(pj, axis=0, keepdims=True)
                vsj = vs4[j]
                pj = pj * (vsj[:, :bh] if vsj.shape[-1] > bh else vsj)
                vj = ((vw_ << (24 - 8 * j)) >> 24).astype(jnp.bfloat16)
                # minor-dim insertion is only legal on 32-bit types: expand
                # the f32 probabilities first, then narrow
                pv = pv + jnp.sum(
                    pj[:, :, None].astype(jnp.bfloat16) * vj, axis=0, dtype=jnp.float32
                )
            l_new = l_prev * alpha + l_add
            acc = acc * alpha.reshape(bh, 1) + pv
            return (m_new, l_new, acc)

        _, l_f, acc_f = jax.lax.fori_loop(
            first,
            n_chunks,
            attn_body_p,
            (
                jnp.full((1, bh), -1e30, jnp.float32),
                jnp.zeros((1, bh), jnp.float32),
                jnp.zeros((bh, dh), jnp.float32),
            ),
        )
        y_attn = (
            acc_f / jnp.maximum(l_f.reshape(bh, 1), 1e-30)
        ).reshape(b, d).astype(jnp.bfloat16)
    elif chunkv2:
        # transpose-free chunk loop (see ops/decode_stack.py chunkv2 note):
        # scores stay (C, BH) as DMA'd; softmax stats ride the loop carry as
        # (1, BH) rows. The int8-cache ks/vs scale folds are also already in
        # (C, BH) layout, so they need no relayout here either.
        starts_row = starts_ref[:].reshape(1, bh)

        def attn_body2(c, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in get_dma(slot, c):
                dma.wait()
            k, v = _load_kv(slot)
            s = _scores(slot, k)  # (C, BH)
            ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, bh), 0) + c * chunk
            s = jnp.where((ids <= pos) & (ids >= starts_row), s, -1e30)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (1, BH)
            p = jnp.exp(s - m_new)  # (C, BH)
            l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
            if cache_int8:
                # fold V dequant into the attention probabilities
                vs = vs_buf[slot]
                p = p * (vs[:, :bh] if vs.shape[-1] > bh else vs)
            if v.dtype == jnp.bfloat16:
                # minor-dim insertion is only legal on 32-bit types: expand
                # the f32 probabilities first, then narrow
                pv = jnp.sum(p[:, :, None].astype(jnp.bfloat16) * v, axis=0, dtype=jnp.float32)
            else:
                pv = jnp.sum(p[:, :, None] * v, axis=0)
            acc = acc * alpha.reshape(bh, 1) + pv
            return (m_new, l_new, acc)

        _, l_f, acc_f = jax.lax.fori_loop(
            first,
            n_chunks,
            attn_body2,
            (
                jnp.full((1, bh), -1e30, jnp.float32),
                jnp.zeros((1, bh), jnp.float32),
                jnp.zeros((bh, dh), jnp.float32),
            ),
        )
        y_attn = (
            acc_f / jnp.maximum(l_f.reshape(bh, 1), 1e-30)
        ).reshape(b, d).astype(jnp.bfloat16)
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

        def attn_body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in get_dma(slot, c):
                dma.wait()
            k, v = _load_kv(slot)
            s = _scores(slot, k).T  # (BH, C)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, chunk), 1) + c * chunk
            s = jnp.where((slot_ids <= pos) & (slot_ids >= starts_ref[:]), s, -1e30)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = jnp.broadcast_to(l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
            pt = p.T  # (C, BH)
            if cache_int8:
                # fold V dequant into the attention probabilities
                vs = vs_buf[slot]
                pt = pt * (vs[:, :bh] if vs.shape[-1] > bh else vs)
            if v.dtype == jnp.bfloat16:
                # minor-dim insertion is only legal on 32-bit types: expand the
                # f32 probabilities first, then narrow
                pt3 = pt[:, :, None].astype(jnp.bfloat16)
                acc_ref[:] = acc_ref[:] * alpha + jnp.sum(
                    pt3 * v, axis=0, dtype=jnp.float32
                )
            else:
                acc_ref[:] = acc_ref[:] * alpha + jnp.sum(pt[:, :, None] * v, axis=0)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            return _

        jax.lax.fori_loop(first, n_chunks, attn_body, None)
        y_attn = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).reshape(b, d).astype(jnp.bfloat16)
    if bpad > b:
        y_pad = jnp.concatenate([y_attn, jnp.zeros((bpad - b, d), jnp.bfloat16)], axis=0)
    else:
        y_pad = y_attn
    ysum = jnp.dot(y_pad, xones_ref[:], preferred_element_type=jnp.float32)

    # ---- phase 4: y = attn @ Wo (int4), streaming packed weight tiles -------
    n_o_tiles = d // tile

    def o_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(wo_hbm.at[li, :, sl], w_buf.at[slot], w_sems.at[slot, 0]),
            pltpu.make_async_copy(so_hbm.at[li, :, sl], sc_buf.at[slot], w_sems.at[slot, 1]),
        )

    for dma in o_dma(0, 0):
        dma.start()

    def o_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_o_tiles)
        def _():
            for dma in o_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in o_dma(slot, j):
            dma.wait()
        acc = _int4_group_matmul(y_pad, ysum, w_buf[slot], sc_buf[slot], groupsize)
        y_ref[:, pl.ds(j * tile, tile)] = acc.astype(y_ref.dtype)
        return _

    jax.lax.fori_loop(0, n_o_tiles, o_body, None)


def decode_attention_block_int4(
    xa: jax.Array,  # (B, D) normed input, bf16
    wqkv_pw: jax.Array,  # (L, D/8, 3D) i32
    wqkv_sc: jax.Array,  # (L, 2*Gp, 3D) f32
    wo_pw: jax.Array,  # (L, D/8, D) i32
    wo_sc: jax.Array,  # (L, 2*Gp, D) f32
    k_cache: jax.Array,  # (L, S, B, H, Dh) bf16, or int8 with k_scale/v_scale
    v_cache: jax.Array,
    layer: jax.Array,
    pos: jax.Array,
    n_head: int,
    starts: jax.Array | None = None,
    groupsize: int = 128,
    tile: int = W4_TILE,
    interpret: bool = False,
    k_scale: jax.Array | None = None,  # (L, S, 1, B*H_kv) f32 for the int8 cache
    v_scale: jax.Array | None = None,
    kv8_mode: str = "bf16",  # int8-cache convert strategy: f32 | i32 | bf16
    chunk: int | None = None,  # cache-stream chunk length override
    n_kv_head: int | None = None,  # GQA cache heads (default: n_head)
):
    """Fused int4 attention block for one decode layer (packed-weight variant
    of decode_attention_block_int8; weights stay STACKED across layers and
    are DMA-sliced by the scalar-prefetched layer index).

    Returns (y (B, D), k_cache, v_cache, k_scale, v_scale) — the scale pair
    is None unless the int8 KV cache is in use. Requires Dh % 128 == 0,
    D % tile == 0, D % (8*groupsize) == 0. GQA (``n_kv_head < n_head``,
    reference fam/llm/fast_model.py:208-221): the cache carries n_kv_head
    heads and the chunk loops run in kv-head space — cache HBM reads (and
    the int8 capacity-cache footprint) shrink by n_head/n_kv_head.

    The quantized cache comes in two storage formats (see KVCache):
    plain int8 (k_cache int8, k_scale (L, S, 1, BHpad)) and int8-in-int32
    word-packed (k_cache int32 (L, S/4, B, H, Dh), k_scale residue-split
    (L, 4, S/4, 1, BHpad)) — the packed format reads the cache stream at
    the 4-byte DMA ceiling and unpacks with native i32 shifts instead of
    relayout-bound i8 converts.
    """
    from metavoice_tpu.ops.quantized import group_ones

    b, d = xa.shape
    dh = d // n_head
    bh = b * n_head
    if n_kv_head is None:
        n_kv_head = n_head
    assert n_head % n_kv_head == 0, (n_head, n_kv_head)
    g = n_head // n_kv_head
    bkv = b * n_kv_head
    qout = wqkv_pw.shape[2]  # (H + 2*H_kv) * Dh
    assert qout == d + 2 * n_kv_head * dh, (qout, d, n_kv_head, dh)
    # GQA qkv widths are not always divisible by the default 1024 tile
    while tile > 256 and (d % tile or qout % tile):
        tile //= 2
    assert d % tile == 0 and qout % tile == 0
    cache_int8 = k_scale is not None
    cache_packed = cache_int8 and k_cache.dtype == jnp.int32
    l = k_cache.shape[0]
    s = k_cache.shape[1] * (4 if cache_packed else 1)
    bpad = max(8, b)
    if chunk is None:
        # MVTPU_BLOCK_CHUNK: A/B sweep knob for the cache-stream chunk
        # length of the per-layer block kernels (the batched quantized-KV
        # serving path), mirroring MVTPU_STACK_CHUNK on the megakernel
        import os as _os

        chunk = int(_os.environ.get("MVTPU_BLOCK_CHUNK", _chunk_for(bkv, dh)))
    gp = wqkv_sc.shape[1] // 2
    x_pad = jnp.zeros((bpad, d), jnp.bfloat16).at[:b].set(xa.astype(jnp.bfloat16))
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    # chunk-loop masks live in kv-head space (the GQA loop shares each
    # chunk across the g query heads of a group)
    starts_bh = jnp.repeat(starts.astype(jnp.int32), n_kv_head).reshape(bkv, 1)
    k_flat = k_cache.reshape(l, k_cache.shape[1], bkv, dh)
    v_flat = v_cache.reshape(l, v_cache.shape[1], bkv, dh)
    # [layer, pos, min_start]: the kernel skips cache chunks entirely below
    # min(starts) — fully masked for every row, so bit-exact (clamped to pos
    # so the chunk-loop prologue DMA can never run past the valid range)
    idx = jnp.stack([
        layer.astype(jnp.int32),
        pos.astype(jnp.int32),
        jnp.minimum(jnp.min(starts.astype(jnp.int32)), pos.astype(jnp.int32)),
    ])
    xones = group_ones(d, gp, groupsize)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x
        pl.BlockSpec(memory_space=pltpu.VMEM),  # xones
        pl.BlockSpec(memory_space=pltpu.VMEM),  # starts
        pl.BlockSpec(memory_space=pltpu.HBM),  # wqkv packed
        pl.BlockSpec(memory_space=pltpu.HBM),  # wqkv sc
        pl.BlockSpec(memory_space=pltpu.HBM),  # wo packed
        pl.BlockSpec(memory_space=pltpu.HBM),  # wo sc
        pl.BlockSpec(memory_space=pltpu.HBM),  # k cache
        pl.BlockSpec(memory_space=pltpu.HBM),  # v cache
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bpad, d), jnp.bfloat16),
        jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
        jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
    ]
    kv_chunk_rows = chunk // 4 if cache_packed else chunk
    scratch = [
        pltpu.VMEM((2, d // 8, tile), jnp.int32),
        pltpu.VMEM((2, 2 * gp, tile), wqkv_sc.dtype),
        pltpu.VMEM((bpad, qout), jnp.float32),
        pltpu.VMEM((2, kv_chunk_rows, bkv, dh), k_cache.dtype),
        pltpu.VMEM((2, kv_chunk_rows, bkv, dh), v_cache.dtype),
    ]
    operands = [idx, x_pad, xones, starts_bh, wqkv_pw, wqkv_sc, wo_pw, wo_sc, k_flat, v_flat]
    if cache_int8:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),  # k scales
            pl.BlockSpec(memory_space=pltpu.HBM),  # v scales
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ]
        bh_pad = k_scale.shape[-1]
        if bh_pad % 128 != 0 or bh_pad < bkv:
            raise ValueError(
                f"int8-cache scale tables must have a 128-aligned lane width "
                f">= B*H_kv (kv_scale_width); got {k_scale.shape} for bkv={bkv}"
            )
        if cache_packed:
            if k_scale.shape != (l, 4, s // 4, 1, bh_pad):
                raise ValueError(
                    f"packed-cache scale tables must be residue-split "
                    f"(L, 4, S/4, 1, BHpad); got {k_scale.shape}"
                )
            scratch += [
                pltpu.VMEM((2, 4, chunk // 4, bh_pad), jnp.float32),  # ks chunks
                pltpu.VMEM((2, 4, chunk // 4, bh_pad), jnp.float32),  # vs chunks
            ]
        else:
            scratch += [
                pltpu.VMEM((2, chunk, bh_pad), jnp.float32),  # ks chunks (seq-major)
                pltpu.VMEM((2, chunk, bh_pad), jnp.float32),  # vs chunks
            ]
        scratch += [
            pltpu.VMEM((1, bh_pad), jnp.float32),  # new-row k scale
            pltpu.VMEM((1, bh_pad), jnp.float32),  # new-row v scale
        ]
        if cache_packed:
            scratch += [
                pltpu.VMEM((1, bkv, dh), jnp.int32),  # new-row K word RMW
                pltpu.VMEM((1, bkv, dh), jnp.int32),  # new-row V word RMW
            ]
        operands += [k_scale, v_scale]
        # aliases: inputs idx..v_flat = 0..9, k_scale=10, v_scale=11
        aliases = {8: 1, 9: 2, 10: 3, 11: 4}
        chunk_sems = 4
    else:
        aliases = {8: 1, 9: 2}
        chunk_sems = 2
    scratch += [
        pltpu.VMEM((bh, dh), jnp.float32),
        pltpu.VMEM((bh, 128), jnp.float32),
        pltpu.VMEM((bh, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, chunk_sems)),
    ]
    if cache_int8:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # scale-row writes
    if cache_packed:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # RMW word-row reads

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        partial(
            _decode_block_int4_kernel,
            dh, chunk, groupsize, g, cache_int8, cache_packed, kv8_mode,
            _chunkv2_enabled(),
        ),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        # large-batch int8-cache shapes exceed the default 16 MB scoped limit
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if cache_int8:
        y, k_out, v_out, ks_out, vs_out = outs
        return (
            y[:b],
            k_out.reshape(k_cache.shape),
            v_out.reshape(v_cache.shape),
            ks_out,
            vs_out,
        )
    y, k_out, v_out = outs
    return (
        y[:b],
        k_out.reshape(k_cache.shape),
        v_out.reshape(v_cache.shape),
        None,
        None,
    )


def decode_attention_block_int8(
    xa: jax.Array,  # (B, D) normed input, bf16
    wqkv_q: jax.Array,  # (D, 3D) int8
    wqkv_s: jax.Array,  # (3D,)
    wo_q: jax.Array,  # (D, D) int8
    wo_s: jax.Array,  # (D,)
    k_cache: jax.Array,  # (L, S, B, H, Dh)
    v_cache: jax.Array,
    layer: jax.Array,
    pos: jax.Array,
    n_head: int,
    starts: jax.Array | None = None,
    interpret: bool = False,
):
    """Fused int8 attention block for one decode layer.

    Returns (y (B, D), k_cache, v_cache). Requires MHA (q/k/v same head
    count), Dh a multiple of 128, B*H a multiple of 8, D % W_TILE == 0.
    """
    b, d = xa.shape
    dh = d // n_head
    bh = b * n_head
    l, s = k_cache.shape[0], k_cache.shape[1]
    bpad = max(8, b)
    chunk = _chunk_for(bh, dh)
    x_pad = jnp.zeros((bpad, d), jnp.bfloat16).at[:b].set(xa.astype(jnp.bfloat16))
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts_bh = jnp.repeat(starts.astype(jnp.int32), n_head).reshape(bh, 1)
    k_flat = k_cache.reshape(l, s, bh, dh)
    v_flat = v_cache.reshape(l, s, bh, dh)
    # [layer, pos, min_start]: the kernel skips cache chunks entirely below
    # min(starts) — fully masked for every row, so bit-exact (clamped to pos
    # so the chunk-loop prologue DMA can never run past the valid range)
    idx = jnp.stack([
        layer.astype(jnp.int32),
        pos.astype(jnp.int32),
        jnp.minimum(jnp.min(starts.astype(jnp.int32)), pos.astype(jnp.int32)),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv scales
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wo scales
            pl.BlockSpec(memory_space=pltpu.VMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.HBM),  # wqkv
            pl.BlockSpec(memory_space=pltpu.HBM),  # wo
            pl.BlockSpec(memory_space=pltpu.HBM),  # k cache
            pl.BlockSpec(memory_space=pltpu.HBM),  # v cache
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d, W_TILE), jnp.int8),
            pltpu.VMEM((bpad, 3 * d), jnp.float32),
            pltpu.VMEM((2, chunk, bh, dh), k_cache.dtype),
            pltpu.VMEM((2, chunk, bh, dh), v_cache.dtype),
            pltpu.VMEM((bh, dh), jnp.float32),
            pltpu.VMEM((bh, 128), jnp.float32),
            pltpu.VMEM((bh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    y, k_out, v_out = pl.pallas_call(
        partial(_decode_block_kernel, dh, chunk, _chunkv2_enabled()),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, d), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
        ),
        grid_spec=grid_spec,
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, x_pad, wqkv_s.reshape(1, -1).astype(jnp.float32), wo_s.reshape(1, -1).astype(jnp.float32), starts_bh, wqkv_q, wo_q, k_flat, v_flat)
    return (
        y[:b],
        k_out.reshape(k_cache.shape),
        v_out.reshape(v_cache.shape),
    )
