"""Whole-stack fused int4 decode kernel: ALL transformer layers in ONE
Pallas call.

Round-2 served each decode token with 48 Pallas launches (per layer: one
attention-block kernel + one FFN kernel, ops/attention.py / ops/quantized.py).
Between launches every weight DMA pipeline drains: each phase pays a cold
first-tile DMA latency, and XLA adds per-launch dispatch bookkeeping inside
the decode while_loop. This kernel replaces the per-layer `lax.scan` with a
``grid=(n_layers,)`` Pallas program — TPU grids execute sequentially and
scratch/semaphores persist across steps, so the weight stream never stops:

  * layer l's FFN epilogue kicks off layer l+1's first qkv weight tile DMA;
  * the attention chunk loop (VPU-bound softmax bookkeeping) runs with the
    output-projection and FFN-w1/w3 first tiles already streaming;
  * the residual stream, per-layer norms, and both residual adds live in
    VMEM for the whole stack — the only HBM traffic is the 4-bit weights,
    the KV cache prefix, and the one new KV row per layer.

Numerics are identical to the two-kernel path (same `_int4_group_matmul`,
same f32->bf16 residual round points, same flash-attention update), pinned
by tests/test_decode_stack.py against the jnp oracle.

Reference counterpart: the decode loop this accelerates is the rebuilt
fam/llm/fast_inference_utils.py:140-179 decode_n_tokens (torch.compile
CUDA-graph path); the reference has no TPU analogue of the fusion itself.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

from metavoice_tpu.ops.attention import _chunk_for
from metavoice_tpu.ops.quantized import (
    _int4_group_matmul,
    _int4_group_matmul_scr,
    _int4_slab_matmul,
    _int8_word_matmul,
    group_ones,
)

STACK_TILE = 1024  # weight tile width (i32 words), matches W4_TILE


def _rmsnorm(x_f32, w, eps):
    """f32 RMSNorm matching transformer._norm: normalize in f32, cast to
    bf16, THEN scale by the bf16 weight (bit-identical rounding points)."""
    nrm = x_f32 * jax.lax.rsqrt(
        jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True) + eps
    )
    return nrm.astype(jnp.bfloat16) * w.astype(jnp.bfloat16)


def _decode_stack_kernel(
    dh: int,
    chunk: int,
    groupsize: int,
    tile: int,
    n_layers: int,
    b: int,
    g: int,  # query heads per kv head (GQA group size; 1 = MHA)
    norm_eps: float,
    bigdot: bool,
    slabdot: bool,
    chunkv2: bool,
    with_head: bool,
    wfmt: str,  # "i4" (int4-in-int32) | "i8" (int8-in-int32)
    # scalar prefetch
    pos_ref,  # (1,) int32
    # VMEM inputs
    x_ref,  # (Bpad, D) bf16 — residual stream at layer 0
    n1_ref,  # (1, 1, D) attn-norm weight row of THIS layer (auto-pipelined)
    n2_ref,  # (1, 1, D) ffn-norm weight row
    xones_ref,  # (D, Gp) bf16
    hones_ref,  # (Ip, G2p) bf16
    starts_ref,  # (BH, 1) int32
    lnf_ref,  # (1, D) final-norm weight (dummy (1, 8) when with_head=False)
    # HBM inputs (stacked over layers; manual DMA)
    wqkv_hbm,  # (L, D/8, 3D) i32
    sqkv_hbm,  # (L, 2*Gp, 3D) bf16
    wo_hbm,  # (L, D/8, D) i32
    so_hbm,  # (L, 2*Gp, D) bf16
    w1_hbm,  # (L, D/8, Ip) i32
    s1_hbm,  # (L, 2*G1p, Ip) bf16
    w3_hbm,
    s3_hbm,
    w2_hbm,  # (L, Ip/8, D) i32
    s2_hbm,  # (L, 2*G2p, D) bf16
    k_hbm,  # (L, S, BH, Dh) — aliased out
    v_hbm,
    hpw_hbm,  # (D/8, Vp) i32 packed tied lm head (dummy when no head)
    hsc_hbm,  # (2*Gp, Vp) bf16
    # outputs
    xo_ref,  # (Bpad, D) bf16 — residual stream after the last layer
    k_out,
    v_out,
    lg_ref,  # (Bpad, Vp) f32 logits (dummy (Bpad, 128) when no head)
    # scratch (persists across grid steps)
    x_scr,  # (Bpad, D) bf16 residual carry
    w_buf,  # (2, D/8, tile) i32 — qkv + o tiles
    sc_buf,  # (2, 2*Gp, tile) bf16
    qkv_scr,  # (Bpad, 3D) f32
    k_buf,  # (2, chunk, BH, Dh) cache-dtype chunks (slot 0 doubles as row stage)
    v_buf,
    w1_buf,  # (2, D/8, tile) i32
    s1_buf,
    w3_buf,
    s3_buf,
    h_scr,  # (Bpad, Ip) bf16
    w2_buf,  # (2, Ip/8, tile) i32
    s2_buf,
    acc_ref,  # (BH, Dh) f32
    m_ref,  # (BH, 128) f32
    l_ref,  # (BH, 128) f32
    wd_scr,  # (Ip, tile) bf16 — big-dot dequantized-tile scratch (or None)
    w_sems,  # DMA (2, 2) — qkv/o weight tiles
    f_sems,  # DMA (2, 4) — ffn w1/w3 tiles
    f2_sems,  # DMA (2, 2) — ffn w2 tiles
    kv_w_sems,  # DMA (2,) — new-row cache writes
    c_sems,  # DMA (2, 2) — cache chunk reads
):
    li = pl.program_id(0)
    pos = pos_ref[0]
    bpad, d = x_ref.shape
    bh = acc_ref.shape[0]  # query rows b * n_head
    bkv = k_buf.shape[2]  # cache rows b * n_kv_head (== bh when MHA)

    def matmul(x, xsum, w_words, sc):
        if wfmt == "i8":
            return _int8_word_matmul(x, xsum, w_words, sc)
        if slabdot:
            return _int4_slab_matmul(x, xsum, w_words, sc, groupsize)
        if bigdot:
            return _int4_group_matmul_scr(x, xsum, w_words, sc, groupsize, wd_scr)
        return _int4_group_matmul(x, xsum, w_words, sc, groupsize)

    # ---- DMA descriptor helpers --------------------------------------------
    def qkv_dma(slot, j, layer):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(wqkv_hbm.at[layer, :, sl], w_buf.at[slot], w_sems.at[slot, 0]),
            pltpu.make_async_copy(sqkv_hbm.at[layer, :, sl], sc_buf.at[slot], w_sems.at[slot, 1]),
        )

    def o_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(wo_hbm.at[li, :, sl], w_buf.at[slot], w_sems.at[slot, 0]),
            pltpu.make_async_copy(so_hbm.at[li, :, sl], sc_buf.at[slot], w_sems.at[slot, 1]),
        )

    def p1_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(w1_hbm.at[li, :, sl], w1_buf.at[slot], f_sems.at[slot, 0]),
            pltpu.make_async_copy(s1_hbm.at[li, :, sl], s1_buf.at[slot], f_sems.at[slot, 1]),
            pltpu.make_async_copy(w3_hbm.at[li, :, sl], w3_buf.at[slot], f_sems.at[slot, 2]),
            pltpu.make_async_copy(s3_hbm.at[li, :, sl], s3_buf.at[slot], f_sems.at[slot, 3]),
        )

    def p2_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(w2_hbm.at[li, :, sl], w2_buf.at[slot], f2_sems.at[slot, 0]),
            pltpu.make_async_copy(s2_hbm.at[li, :, sl], s2_buf.at[slot], f2_sems.at[slot, 1]),
        )

    def head_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(hpw_hbm.at[:, sl], w_buf.at[slot], w_sems.at[slot, 0]),
            pltpu.make_async_copy(hsc_hbm.at[:, sl], sc_buf.at[slot], w_sems.at[slot, 1]),
        )

    def chunk_dma(slot, c):
        return (
            pltpu.make_async_copy(k_out.at[li, pl.ds(c * chunk, chunk)], k_buf.at[slot], c_sems.at[slot, 0]),
            pltpu.make_async_copy(v_out.at[li, pl.ds(c * chunk, chunk)], v_buf.at[slot], c_sems.at[slot, 1]),
        )

    # ---- layer entry: residual stream + this layer's qkv tile 0 ------------
    @pl.when(li == 0)
    def _():
        x_scr[:] = x_ref[:]
        for dma in qkv_dma(0, 0, li):
            dma.start()
    # (for li > 0, layer li-1's epilogue already started our tile 0)

    x = x_scr[:]
    xa_pad = _rmsnorm(x.astype(jnp.float32), n1_ref[0, 0, :], norm_eps)
    xsum = jnp.dot(xa_pad, xones_ref[:], preferred_element_type=jnp.float32)

    # ---- phase 1: qkv projection (int4 weight stream) ----------------------
    n_qkv_tiles = qkv_scr.shape[1] // tile  # (H + 2*H_kv) * Dh columns

    def qkv_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_qkv_tiles)
        def _():
            for dma in qkv_dma(jax.lax.rem(j + 1, 2), j + 1, li):
                dma.start()

        for dma in qkv_dma(slot, j, li):
            dma.wait()
        acc = matmul(xa_pad, xsum, w_buf[slot], sc_buf[slot])
        qkv_scr[:, pl.ds(j * tile, tile)] = acc
        return _

    jax.lax.fori_loop(0, n_qkv_tiles, qkv_body, None)

    # ---- phase 2: cache row write + attention with o/w1/w3 prefetch --------
    dkv = (bkv // b) * dh  # K (= V) projection width per batch row
    q = qkv_scr[:b, :d].reshape(bh, dh) * (1.0 / np.sqrt(dh))
    k_row = qkv_scr[:b, d : d + dkv].reshape(bkv, dh)
    v_row = qkv_scr[:b, d + dkv : d + 2 * dkv].reshape(bkv, dh)
    k_buf[0, 0] = k_row.astype(k_out.dtype)
    v_buf[0, 0] = v_row.astype(v_out.dtype)
    kw = pltpu.make_async_copy(k_buf.at[0, pl.ds(0, 1)], k_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[0])
    vw = pltpu.make_async_copy(v_buf.at[0, pl.ds(0, 1)], v_out.at[li, pl.ds(pos, 1)], kv_w_sems.at[1])
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()

    for dma in chunk_dma(0, 0):
        dma.start()
    # the attention chunk loop is VPU+cache-DMA bound: stream the weights the
    # next two phases need underneath it
    for dma in o_dma(0, 0):
        dma.start()
    for dma in p1_dma(0, 0):
        dma.start()

    n_chunks = (pos + chunk) // chunk
    if g > 1:
        # GQA chunk loop: K/V chunks stay in KV-HEAD space ((C, BKV, Dh) as
        # DMA'd) and the g query heads of each group run as a STATIC loop of
        # (C, BKV) score blocks sharing the chunk — identical VPU work to
        # MHA at the same query count, 1/g the cache DMA bytes, and no
        # repeat relayout (see ops/attention.py multi-kernel notes).
        q_g = qkv_scr[:b, :d].reshape(bkv, g, dh) * (1.0 / np.sqrt(dh))
        starts_row = starts_ref[:].reshape(1, bkv)

        def attn_body_g(c, carry):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in chunk_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in chunk_dma(slot, c):
                dma.wait()
            k = k_buf[slot].astype(jnp.float32)  # (C, BKV, Dh)
            v = v_buf[slot].astype(jnp.float32)
            ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, bkv), 0) + c * chunk
            valid = (ids <= pos) & (ids >= starts_row)
            out = []
            for i in range(g):
                m_prev, l_prev, acc = carry[i]
                s = jnp.sum(q_g[:, i, :][None, :, :] * k, axis=-1)  # (C, BKV)
                s = jnp.where(valid, s, -1e30)
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
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
            for _ in range(g)
        )
        final = jax.lax.fori_loop(0, n_chunks, attn_body_g, init)
        ys = [
            acc_f / jnp.maximum(l_f.reshape(bkv, 1), 1e-30)
            for (_, l_f, acc_f) in final
        ]
        # interleave back to query-head order: rows (b, h_kv, i) -> b*H + h
        y_attn = (
            jnp.stack(ys, axis=1).reshape(bh, dh).reshape(b, d).astype(jnp.bfloat16)
        )
    elif chunkv2:
        # transpose-free chunk loop: scores stay in the (chunk, BH) layout
        # the cache DMA delivers — no per-chunk (C, BH)<->(BH, C) relayouts
        # (the VPU cost the perf notes blame for the ~180 GB/s ceiling at
        # large batch*heads). Softmax stats ride the loop carry as (1, BH)
        # rows; the only per-chunk relayout left is the (1, BH)->(BH, 1)
        # alpha column for the accumulator update.
        starts_row = starts_ref[:].reshape(1, bh)  # one relayout per layer

        def attn_body2(c, carry):
            m_prev, l_prev, acc = carry  # (1, BH), (1, BH), (BH, Dh) f32
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in chunk_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in chunk_dma(slot, c):
                dma.wait()
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
            0,
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
                for dma in chunk_dma(jax.lax.rem(c + 1, 2), c + 1):
                    dma.start()

            for dma in chunk_dma(slot, c):
                dma.wait()
            k = k_buf[slot].astype(jnp.float32)
            v = v_buf[slot].astype(jnp.float32)
            s_pre = jnp.sum(q[None, :, :] * k, axis=-1)  # (C, BH)
            s = s_pre.T  # (BH, C)
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, chunk), 1) + c * chunk
            s = jnp.where((slot_ids <= pos) & (slot_ids >= starts_ref[:]), s, -1e30)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
            )
            acc_ref[:] = acc_ref[:] * alpha + jnp.sum(p.T[:, :, None] * v, axis=0)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            return _

        jax.lax.fori_loop(0, n_chunks, attn_body, None)
        y_attn = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).reshape(b, d).astype(jnp.bfloat16)
    if bpad > b:
        y_pad = jnp.concatenate(
            [y_attn, jnp.zeros((bpad - b, d), jnp.bfloat16)], axis=0
        )
    else:
        y_pad = y_attn
    ysum = jnp.dot(y_pad, xones_ref[:], preferred_element_type=jnp.float32)

    # ---- phase 3: output projection + residual add -------------------------
    n_o_tiles = d // tile

    def o_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_o_tiles)
        def _():
            for dma in o_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in o_dma(slot, j):
            dma.wait()
        acc = matmul(y_pad, ysum, w_buf[slot], sc_buf[slot])
        sl = pl.ds(j * tile, tile)
        # h = x + attn_out, rounded to bf16 exactly like the two-kernel path
        x_scr[:, sl] = x_scr[:, sl] + acc.astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, n_o_tiles, o_body, None)

    # layer li+1's qkv tile 0 can stream during our entire FFN; on the LAST
    # layer the fused lm head's first tile streams instead
    @pl.when(li + 1 < n_layers)
    def _():
        for dma in qkv_dma(0, 0, li + 1):
            dma.start()

    if with_head:
        @pl.when(li + 1 == n_layers)
        def _():
            for dma in head_dma(0, 0):
                dma.start()

    # ---- phase 4: FFN (SwiGLU, int4 weight stream) -------------------------
    h = x_scr[:]
    hn = _rmsnorm(h.astype(jnp.float32), n2_ref[0, 0, :], norm_eps)
    hsum = jnp.dot(hn, xones_ref[:], preferred_element_type=jnp.float32)
    ip = h_scr.shape[1]
    n_i_tiles = ip // tile
    n_d_tiles = d // tile

    def p1_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_i_tiles)
        def _():
            for dma in p1_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in p1_dma(slot, j):
            dma.wait()
        h1 = matmul(hn, hsum, w1_buf[slot], s1_buf[slot])
        h3 = matmul(hn, hsum, w3_buf[slot], s3_buf[slot])
        h_scr[:, pl.ds(j * tile, tile)] = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, n_i_tiles, p1_body, None)

    hh = h_scr[:]
    hhsum = jnp.dot(hh, hones_ref[:], preferred_element_type=jnp.float32)

    for dma in p2_dma(0, 0):
        dma.start()

    def p2_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_d_tiles)
        def _():
            for dma in p2_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in p2_dma(slot, j):
            dma.wait()
        acc = matmul(hh, hhsum, w2_buf[slot], s2_buf[slot])
        sl = pl.ds(j * tile, tile)
        x_scr[:, sl] = x_scr[:, sl] + acc.astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, n_d_tiles, p2_body, None)

    # flush the (final) residual stream every step — cheap, and correct under
    # either flush-once or flush-per-step output semantics
    xo_ref[:] = x_scr[:]

    # ---- phase 5 (last layer only): final norm + int4 tied lm head ---------
    if with_head:
        n_h_tiles = lg_ref.shape[1] // tile

        @pl.when(li + 1 == n_layers)
        def _():
            xf = _rmsnorm(x_scr[:].astype(jnp.float32), lnf_ref[0, :], norm_eps)
            xfsum = jnp.dot(xf, xones_ref[:], preferred_element_type=jnp.float32)

            def h_body(j, _):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < n_h_tiles)
                def _():
                    for dma in head_dma(jax.lax.rem(j + 1, 2), j + 1):
                        dma.start()

                for dma in head_dma(slot, j):
                    dma.wait()
                acc = matmul(xf, xfsum, w_buf[slot], sc_buf[slot])
                lg_ref[:, pl.ds(j * tile, tile)] = acc
                return _

            jax.lax.fori_loop(0, n_h_tiles, h_body, None)


def decode_stack_int4(
    x: jax.Array,  # (B, D) residual stream (NOT normed), bf16
    norm1_w: jax.Array,  # (L, D) attn-norm weights
    norm2_w: jax.Array,  # (L, D) ffn-norm weights
    wqkv_pw: jax.Array,  # (L, D/8, 3D) i32
    wqkv_sc: jax.Array,
    wo_pw: jax.Array,
    wo_sc: jax.Array,
    w1_pw: jax.Array,  # (L, D/8, Ip)
    w1_sc: jax.Array,
    w3_pw: jax.Array,
    w3_sc: jax.Array,
    w2_pw: jax.Array,  # (L, Ip/8, D)
    w2_sc: jax.Array,
    k_cache: jax.Array,  # (L, S, B, H_kv, Dh) bf16
    v_cache: jax.Array,
    pos: jax.Array,  # () int32
    n_head: int,
    *,
    n_kv_head: int | None = None,  # GQA cache heads (default: n_head)
    starts: jax.Array | None = None,
    norm_eps: float = 1e-5,
    groupsize: int = 128,
    tile: int = STACK_TILE,
    chunk: int | None = None,
    bigdot: bool | None = None,
    slabdot: bool | None = None,
    chunkv2: bool | None = None,
    wfmt: str = "i4",  # weight format: int4-in-int32 | int8-in-int32
    ln_f_w: jax.Array | None = None,  # (D,) — enables the fused head
    head_pw: jax.Array | None = None,  # (D/8, Vp) i32 packed wte^T
    head_sc: jax.Array | None = None,  # (2*Gp, Vp) bf16
    interpret: bool = False,
):
    """All decode layers in one Pallas call (see module docstring).

    Returns (x_out (B, D) bf16 residual stream after the last layer,
    k_cache, v_cache) — and, when ``ln_f_w``/``head_pw``/``head_sc`` are
    given, a fourth element: (B, Vp) f32 logits from a FUSED final
    norm + int4 tied-lm-head phase on the last grid step (the bf16 tied
    head read was the last non-4-bit weight stream in the decode path).
    Requires MHA, Dh % 128 == 0, D % tile == 0, bf16 cache (the int8-cache
    serving path keeps the two-kernel route).
    """
    b, d = x.shape
    dh = d // n_head
    bh = b * n_head
    if n_kv_head is None:
        n_kv_head = n_head
    g = n_head // n_kv_head
    assert n_head % n_kv_head == 0, (n_head, n_kv_head)
    bkv = b * n_kv_head
    qout = wqkv_pw.shape[2]  # (H + 2*H_kv) * Dh
    assert qout == d + 2 * n_kv_head * dh, (qout, d, n_kv_head, dh)
    l, s = k_cache.shape[0], k_cache.shape[1]
    ip = w1_pw.shape[2]
    words = 8 if wfmt == "i4" else 4  # values packed per i32 word
    assert w2_pw.shape[1] * words == ip and w2_pw.shape[2] == d
    # GQA qkv widths (e.g. 2560 for d=2048, H_kv=2) are not always divisible
    # by the default 1024 tile: drop to the largest tile all phases accept
    while tile > 256 and (d % tile or ip % tile or qout % tile):
        tile //= 2
    assert d % tile == 0 and ip % tile == 0 and qout % tile == 0
    assert dh % 128 == 0 and bh % 8 == 0 and bkv % 8 == 0
    bpad = max(8, b)
    if chunk is None:
        # cap at 128: the chunk loop reads whole chunks even when `pos` sits
        # mid-chunk, and at serving positions (~64-500) the wasted tail read
        # of a 256-chunk outweighs its lower per-chunk softmax overhead
        # (measured: 527 tok/s at 256 vs 542 at 128 on the full model)
        chunk = min(_chunk_for(bkv, dh), 128)
    import os as _os

    # experiment knobs (documented in docs/PERFORMANCE.md)
    tile = int(_os.environ.get("MVTPU_STACK_TILE", tile))
    chunk = int(_os.environ.get("MVTPU_STACK_CHUNK", chunk))
    gp = wqkv_sc.shape[1] // 2
    g1p = w1_sc.shape[1] // 2
    g2p = w2_sc.shape[1] // 2
    # one group-sum matrix serves x, attn-out and ffn-in (all width D); the
    # FFN hidden uses its own
    assert w3_sc.shape[1] // 2 == g1p and wo_sc.shape[1] // 2 == gp and gp == g1p

    x_pad = jnp.zeros((bpad, d), jnp.bfloat16).at[:b].set(x.astype(jnp.bfloat16))
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    # the chunk-loop masks live in kv-head space (the GQA loop shares each
    # chunk across the g query heads of a group)
    starts_bh = jnp.repeat(starts.astype(jnp.int32), n_kv_head).reshape(bkv, 1)
    k_flat = k_cache.reshape(l, s, bkv, dh)
    v_flat = v_cache.reshape(l, s, bkv, dh)
    if wfmt == "i8":
        # one affine 'group' spans the whole contraction (per-channel int8):
        # xsum column 0 carries sum(x), the epilogue applies c = -128*s
        xones = group_ones(d, gp, d)
        hones = group_ones(ip, g2p, ip)
    else:
        xones = group_ones(d, gp, groupsize)
        hones = group_ones(ip, g2p, groupsize)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    with_head = head_pw is not None
    if with_head:
        assert ln_f_w is not None and head_sc is not None
        vp = head_pw.shape[1]
        assert vp % tile == 0 and head_pw.shape[0] * 8 == d
        assert head_sc.shape[0] == 2 * gp
        lnf = ln_f_w.reshape(1, d)
    else:
        vp = 128
        lnf = jnp.zeros((1, 8), jnp.bfloat16)
        head_pw = jnp.zeros((1, 8), jnp.int32)
        head_sc = jnp.zeros((1, 8), jnp.bfloat16)
    if bigdot is None:
        # measured on v5e: bigdot=True decodes at 333 tok/s vs 527 for the
        # per-group small-dot path — the (K, tile) scratch round-trip and
        # per-weight bf16 scaling cost far more than the small-dot dispatch
        # overhead they remove. Kept as an experiment flag only.
        bigdot = _os.environ.get("MVTPU_STACK_BIGDOT", "0") == "1"
    if slabdot is None:
        slabdot = _os.environ.get("MVTPU_STACK_SLABDOT", "0") == "1"
    if chunkv2 is None:
        # default ON (measured: +6-8% batch-8 aggregate, ~+2% single-stream;
        # bit-identical in interpret mode) — "0" falls back to the
        # transposing loop
        chunkv2 = _os.environ.get("MVTPU_STACK_CHUNKV2", "1") == "1"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((bpad, d), lambda i, *_: (0, 0)),  # x (fetch once)
            # (L, 1, D) so the auto-pipelined per-layer block is (1, 1, D):
            # Mosaic requires the last two block dims to be tile-divisible
            # or equal to the array dims — (1, D) rows of (L, D) are not
            pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0)),  # norm1 row
            pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0)),  # norm2 row
            pl.BlockSpec((d, gp), lambda i, *_: (0, 0)),  # xones
            pl.BlockSpec((ip, g2p), lambda i, *_: (0, 0)),  # hones
            pl.BlockSpec((bkv, 1), lambda i, *_: (0, 0)),  # starts
            pl.BlockSpec(lnf.shape, lambda i, *_: (0, 0)),  # ln_f (or dummy)
            pl.BlockSpec(memory_space=pltpu.HBM),  # wqkv
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # wo
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # w1
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # w3
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # w2
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # k cache
            pl.BlockSpec(memory_space=pltpu.HBM),  # v cache
            pl.BlockSpec(memory_space=pltpu.HBM),  # head pw (or dummy)
            pl.BlockSpec(memory_space=pltpu.HBM),  # head sc (or dummy)
        ],
        out_specs=(
            pl.BlockSpec((bpad, d), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((bpad, vp), lambda i, *_: (0, 0)),  # logits (or dummy)
        ),
        scratch_shapes=[
            pltpu.VMEM((bpad, d), jnp.bfloat16),  # x_scr
            pltpu.VMEM((2, d // words, tile), jnp.int32),  # w_buf
            pltpu.VMEM((2, 2 * gp, tile), wqkv_sc.dtype),  # sc_buf
            pltpu.VMEM((bpad, qout), jnp.float32),  # qkv_scr
            pltpu.VMEM((2, chunk, bkv, dh), k_cache.dtype),  # k_buf
            pltpu.VMEM((2, chunk, bkv, dh), v_cache.dtype),  # v_buf
            pltpu.VMEM((2, d // words, tile), jnp.int32),  # w1_buf
            pltpu.VMEM((2, 2 * g1p, tile), w1_sc.dtype),
            pltpu.VMEM((2, d // words, tile), jnp.int32),  # w3_buf
            pltpu.VMEM((2, 2 * g1p, tile), w3_sc.dtype),
            pltpu.VMEM((bpad, ip), jnp.bfloat16),  # h_scr
            pltpu.VMEM((2, ip // words, tile), jnp.int32),  # w2_buf
            pltpu.VMEM((2, 2 * g2p, tile), w2_sc.dtype),
            pltpu.VMEM((bh, dh), jnp.float32),  # acc
            pltpu.VMEM((bh, 128), jnp.float32),  # m
            pltpu.VMEM((bh, 128), jnp.float32),  # l
            # big-dot scratch only when that experiment flag is on — it is
            # 12-25 MB of VMEM that otherwise just crowds the working set
            pltpu.VMEM(
                (max(ip, d), tile) if bigdot else (8, 128), jnp.bfloat16
            ),  # wd_scr
            pltpu.SemaphoreType.DMA((2, 2)),  # w_sems
            pltpu.SemaphoreType.DMA((2, 4)),  # f_sems
            pltpu.SemaphoreType.DMA((2, 2)),  # f2_sems
            pltpu.SemaphoreType.DMA((2,)),  # kv row writes
            pltpu.SemaphoreType.DMA((2, 2)),  # cache chunks
        ],
    )
    xo, k_out, v_out, lg = pl.pallas_call(
        partial(
            _decode_stack_kernel, dh, chunk, groupsize, tile, l, b, g, norm_eps,
            bigdot, slabdot, chunkv2, with_head, wfmt,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, d), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_flat.shape, k_flat.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_flat.dtype),
            jax.ShapeDtypeStruct((bpad, vp), jnp.float32),
        ),
        grid_spec=grid_spec,
        # operands: [scalars, x, n1, n2, xones, hones, starts, lnf,
        # 10 weights, k, v, hpw, hsc] -> k at index 18, v at 19
        input_output_aliases={18: 1, 19: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pos_arr, x_pad, norm1_w.reshape(l, 1, d), norm2_w.reshape(l, 1, d), xones, hones, starts_bh,
        lnf, wqkv_pw, wqkv_sc, wo_pw, wo_sc, w1_pw, w1_sc, w3_pw, w3_sc,
        w2_pw, w2_sc, k_flat, v_flat, head_pw, head_sc,
    )
    out = (
        xo[:b],
        k_out.reshape(k_cache.shape),
        v_out.reshape(v_cache.shape),
    )
    if with_head:
        return out + (lg[:b],)
    return out
